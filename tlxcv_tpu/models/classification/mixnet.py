"""MixNet — mixed depthwise kernels (reference
tlxcv/models/classification/mixnet.py, paddle2tlx-converted), NHWC."""
from __future__ import annotations

import jax.numpy as jnp

from ... import nn
from .utils import make_divisible

__all__ = ["MixNet", "mixnet_s", "mixnet_m"]


class MixedDWConv(nn.Module):
    """Depthwise conv with a mix of kernel sizes across channel groups."""

    def __init__(self, channels, kernel_sizes, stride=1):
        n = len(kernel_sizes)
        splits = [channels // n] * n
        splits[0] += channels - sum(splits)
        self.splits = splits
        self.convs = [nn.Conv2d(c, c, k, stride=stride, padding=k // 2,
                                groups=c, bias=False)
                      for c, k in zip(splits, kernel_sizes)]

    def __call__(self, x):
        parts = jnp.split(x, np_cumsum(self.splits[:-1]), axis=-1)
        return jnp.concatenate([conv(p) for conv, p in zip(self.convs, parts)],
                               -1)


def np_cumsum(vals):
    out, acc = [], 0
    for v in vals:
        acc += v
        out.append(acc)
    return out


class SE(nn.Module):
    def __init__(self, ch, reduction=4):
        mid = max(1, ch // reduction)
        self.fc1 = nn.Conv2d(ch, mid, 1)
        self.fc2 = nn.Conv2d(mid, ch, 1)

    def __call__(self, x):
        s = x.mean(axis=(1, 2), keepdims=True)
        return x * nn.sigmoid(self.fc2(nn.relu(self.fc1(s))))


class MixBlock(nn.Module):
    def __init__(self, cin, cout, kernels, expand, stride, se_ratio, act):
        mid = cin * expand
        self.use_res = stride == 1 and cin == cout
        self.expand = expand != 1
        if self.expand:
            self.pw1 = nn.Conv2d(cin, mid, 1, bias=False)
            self.bn1 = nn.BatchNorm(mid)
        self.dw = MixedDWConv(mid, kernels, stride)
        self.bn2 = nn.BatchNorm(mid)
        self.se = SE(mid, int(1 / se_ratio)) if se_ratio else None
        self.pw2 = nn.Conv2d(mid, cout, 1, bias=False)
        self.bn3 = nn.BatchNorm(cout)
        self.act = nn.get_activation(act)

    def __call__(self, x):
        out = x
        if self.expand:
            out = self.act(self.bn1(self.pw1(out)))
        out = self.act(self.bn2(self.dw(out)))
        if self.se is not None:
            out = self.se(out)
        out = self.bn3(self.pw2(out))
        return x + out if self.use_res else out


# cin, cout, kernels, expand, stride, se_ratio, act  (mixnet-s)
_S_CFG = [
    (16, 16, (3,), 1, 1, 0, "relu"),
    (16, 24, (3,), 6, 2, 0, "relu"),
    (24, 24, (3,), 3, 1, 0, "relu"),
    (24, 40, (3, 5, 7), 6, 2, 0.5, "swish"),
    (40, 40, (3, 5), 6, 1, 0.5, "swish"),
    (40, 40, (3, 5), 6, 1, 0.5, "swish"),
    (40, 40, (3, 5), 6, 1, 0.5, "swish"),
    (40, 80, (3, 5, 7), 6, 2, 0.25, "swish"),
    (80, 80, (3, 5), 6, 1, 0.25, "swish"),
    (80, 80, (3, 5), 6, 1, 0.25, "swish"),
    (80, 120, (3, 5, 7), 6, 1, 0.5, "swish"),
    (120, 120, (3, 5, 7, 9), 3, 1, 0.5, "swish"),
    (120, 120, (3, 5, 7, 9), 3, 1, 0.5, "swish"),
    (120, 200, (3, 5, 7, 9, 11), 6, 2, 0.5, "swish"),
    (200, 200, (3, 5, 7, 9), 6, 1, 0.5, "swish"),
    (200, 200, (3, 5, 7, 9), 6, 1, 0.5, "swish"),
]


class MixNet(nn.Module):
    def __init__(self, cfg=_S_CFG, stem=16, num_classes=1000, width=1.0):
        s = lambda c: make_divisible(c * width, 8)
        self.stem = nn.Sequential(
            nn.Conv2d(3, s(stem), 3, stride=2, padding=1, bias=False),
            nn.BatchNorm(s(stem)), nn.Activation("relu"))
        self.blocks = [MixBlock(s(ci), s(co), ks, e, st, se, act)
                       for ci, co, ks, e, st, se, act in cfg]
        last = s(cfg[-1][1])
        self.head = nn.Sequential(nn.Conv2d(last, 1536, 1, bias=False),
                                  nn.BatchNorm(1536), nn.Activation("relu"))
        self.pool = nn.GlobalAvgPool2d()
        self.fc = nn.Linear(1536, num_classes)

    def __call__(self, x):
        x = self.stem(x)
        for b in self.blocks:
            x = b(x)
        return self.fc(self.pool(self.head(x)))


def mixnet_s(pretrained=False, **kw):
    return MixNet(**kw)


def mixnet_m(pretrained=False, **kw):
    return MixNet(width=1.0, stem=24, **kw)
