"""PP-LCNet (reference tlxcv/models/classification/pp_lcnet.py,
paddle2tlx-converted), NHWC."""
from __future__ import annotations

import jax.numpy as jnp

from ... import nn
from .utils import make_divisible

__all__ = ["PPLCNet", "pp_lcnet"]

# k, cin, cout, stride, use_se (x0.5..x2 handled by scale)
_CFG = [
    (3, 16, 32, 1, 0),
    (3, 32, 64, 2, 0), (3, 64, 64, 1, 0),
    (3, 64, 128, 2, 0), (3, 128, 128, 1, 0),
    (3, 128, 256, 2, 0), (5, 256, 256, 1, 0), (5, 256, 256, 1, 0),
    (5, 256, 256, 1, 0), (5, 256, 256, 1, 0), (5, 256, 256, 1, 0),
    (5, 256, 512, 2, 1), (5, 512, 512, 1, 1),
]


class SE(nn.Module):
    def __init__(self, ch):
        self.fc1 = nn.Conv2d(ch, ch // 4, 1)
        self.fc2 = nn.Conv2d(ch // 4, ch, 1)

    def __call__(self, x):
        s = x.mean(axis=(1, 2), keepdims=True)
        return x * nn.hardsigmoid(self.fc2(nn.relu(self.fc1(s))))


class DWBlock(nn.Module):
    def __init__(self, cin, cout, k, stride, use_se):
        self.dw = nn.Conv2d(cin, cin, k, stride=stride, padding=k // 2,
                            groups=cin, bias=False)
        self.dw_bn = nn.BatchNorm(cin)
        self.se = SE(cin) if use_se else None
        self.pw = nn.Conv2d(cin, cout, 1, bias=False)
        self.pw_bn = nn.BatchNorm(cout)

    def __call__(self, x):
        x = nn.hardswish(self.dw_bn(self.dw(x)))
        if self.se is not None:
            x = self.se(x)
        return nn.hardswish(self.pw_bn(self.pw(x)))


class PPLCNet(nn.Module):
    def __init__(self, scale=1.0, num_classes=1000, dropout=0.2):
        s = lambda c: make_divisible(c * scale, 8)
        self.stem = nn.Sequential(
            nn.Conv2d(3, s(16), 3, stride=2, padding=1, bias=False),
            nn.BatchNorm(s(16)), nn.Activation("hardswish"))
        self.blocks = [DWBlock(s(cin), s(cout), k, st, se)
                       for k, cin, cout, st, se in _CFG]
        self.pool = nn.GlobalAvgPool2d(keepdims=True)
        self.last_conv = nn.Conv2d(s(512), 1280, 1)
        self.drop = nn.Dropout(dropout)
        self.fc = nn.Linear(1280, num_classes)

    def __call__(self, x):
        x = self.stem(x)
        for b in self.blocks:
            x = b(x)
        x = nn.hardswish(self.last_conv(self.pool(x)))
        return self.fc(self.drop(x[:, 0, 0, :]))


def pp_lcnet(pretrained=False, scale=1.0, **kw):
    return PPLCNet(scale=scale, **kw)
