"""GhostNet (reference tlxcv/models/classification/ghostnet.py,
paddle2tlx-converted), NHWC."""
from __future__ import annotations

import math

import jax.numpy as jnp

from ... import nn
from .utils import make_divisible

__all__ = ["GhostNet", "ghostnet"]


class GhostModule(nn.Module):
    def __init__(self, cin, cout, k=1, ratio=2, dw_size=3, stride=1, act=True):
        init_ch = math.ceil(cout / ratio)
        cheap_ch = init_ch * (ratio - 1)
        self.primary = nn.Sequential(
            nn.Conv2d(cin, init_ch, k, stride=stride, padding=k // 2,
                      bias=False),
            nn.BatchNorm(init_ch),
            nn.Activation("relu") if act else nn.Identity())
        self.cheap = nn.Sequential(
            nn.Conv2d(init_ch, cheap_ch, dw_size, padding=dw_size // 2,
                      groups=init_ch, bias=False),
            nn.BatchNorm(cheap_ch),
            nn.Activation("relu") if act else nn.Identity())
        self.cout = cout

    def __call__(self, x):
        x1 = self.primary(x)
        x2 = self.cheap(x1)
        return jnp.concatenate([x1, x2], -1)[..., :self.cout]


class SE(nn.Module):
    def __init__(self, ch, ratio=4):
        mid = make_divisible(ch / ratio, 4)
        self.fc1 = nn.Conv2d(ch, mid, 1)
        self.fc2 = nn.Conv2d(mid, ch, 1)

    def __call__(self, x):
        s = x.mean(axis=(1, 2), keepdims=True)
        s = nn.relu(self.fc1(s))
        return x * jnp.clip(self.fc2(s) + 3, 0, 6) / 6


class GhostBottleneck(nn.Module):
    def __init__(self, cin, mid, cout, k, stride, use_se):
        self.ghost1 = GhostModule(cin, mid)
        self.stride = stride
        if stride > 1:
            self.dw = nn.Conv2d(mid, mid, k, stride=stride, padding=k // 2,
                                groups=mid, bias=False)
            self.dw_bn = nn.BatchNorm(mid)
        self.se = SE(mid) if use_se else None
        self.ghost2 = GhostModule(mid, cout, act=False)
        self.shortcut = None
        if cin != cout or stride != 1:
            self.shortcut = nn.Sequential(
                nn.Conv2d(cin, cin, k, stride=stride, padding=k // 2,
                          groups=cin, bias=False), nn.BatchNorm(cin),
                nn.Conv2d(cin, cout, 1, bias=False), nn.BatchNorm(cout))

    def __call__(self, x):
        out = self.ghost1(x)
        if self.stride > 1:
            out = self.dw_bn(self.dw(out))
        if self.se is not None:
            out = self.se(out)
        out = self.ghost2(out)
        sc = x if self.shortcut is None else self.shortcut(x)
        return out + sc


_CFG = [  # k, exp, out, se, stride
    (3, 16, 16, 0, 1), (3, 48, 24, 0, 2), (3, 72, 24, 0, 1),
    (5, 72, 40, 1, 2), (5, 120, 40, 1, 1), (3, 240, 80, 0, 2),
    (3, 200, 80, 0, 1), (3, 184, 80, 0, 1), (3, 184, 80, 0, 1),
    (3, 480, 112, 1, 1), (3, 672, 112, 1, 1), (5, 672, 160, 1, 2),
    (5, 960, 160, 0, 1), (5, 960, 160, 1, 1), (5, 960, 160, 0, 1),
    (5, 960, 160, 1, 1),
]


class GhostNet(nn.Module):
    def __init__(self, scale=1.0, num_classes=1000):
        s = lambda c: make_divisible(c * scale, 4)
        self.stem = nn.Sequential(
            nn.Conv2d(3, s(16), 3, stride=2, padding=1, bias=False),
            nn.BatchNorm(s(16)), nn.Activation("relu"))
        blocks = []
        cin = s(16)
        for k, exp, out, se, stride in _CFG:
            blocks.append(GhostBottleneck(cin, s(exp), s(out), k, stride, se))
            cin = s(out)
        self.blocks = blocks
        self.head_conv = nn.Sequential(
            nn.Conv2d(cin, s(960), 1, bias=False), nn.BatchNorm(s(960)),
            nn.Activation("relu"))
        self.pool = nn.GlobalAvgPool2d(keepdims=True)
        self.conv_last = nn.Conv2d(s(960), 1280, 1)
        self.fc = nn.Linear(1280, num_classes)

    def __call__(self, x):
        x = self.stem(x)
        for b in self.blocks:
            x = b(x)
        x = self.pool(self.head_conv(x))
        x = nn.relu(self.conv_last(x))
        return self.fc(x[:, 0, 0, :])


def ghostnet(pretrained=False, scale=1.0, **kw):
    return GhostNet(scale=scale, **kw)
