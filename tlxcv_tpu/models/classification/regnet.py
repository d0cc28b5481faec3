"""RegNetX/Y (reference tlxcv/models/classification/regnet.py,
paddle2tlx-converted), NHWC."""
from __future__ import annotations

import numpy as np

from ... import nn

__all__ = ["RegNet", "regnetx_4gf", "regnety_4gf"]


def _generate_widths(w_a, w_0, w_m, depth, q=8):
    ws_cont = np.arange(depth) * w_a + w_0
    ks = np.round(np.log(ws_cont / w_0) / np.log(w_m))
    ws = w_0 * np.power(w_m, ks)
    ws = np.round(np.divide(ws, q)) * q
    widths, counts = np.unique(ws.astype(int), return_counts=True)
    return widths.tolist(), counts.tolist()


class SE(nn.Module):
    def __init__(self, ch, se_ch):
        self.fc1 = nn.Conv2d(ch, se_ch, 1)
        self.fc2 = nn.Conv2d(se_ch, ch, 1)

    def __call__(self, x):
        s = x.mean(axis=(1, 2), keepdims=True)
        return x * nn.sigmoid(self.fc2(nn.relu(self.fc1(s))))


class Bottleneck(nn.Module):
    def __init__(self, cin, cout, stride, group_width, se_ratio=0.0):
        groups = cout // group_width
        self.a = nn.Sequential(nn.Conv2d(cin, cout, 1, bias=False),
                               nn.BatchNorm(cout), nn.Activation("relu"))
        self.b = nn.Sequential(
            nn.Conv2d(cout, cout, 3, stride=stride, padding=1, groups=groups,
                      bias=False), nn.BatchNorm(cout), nn.Activation("relu"))
        self.se = SE(cout, int(cin * se_ratio)) if se_ratio > 0 else None
        self.c = nn.Sequential(nn.Conv2d(cout, cout, 1, bias=False),
                               nn.BatchNorm(cout))
        self.proj = None
        if cin != cout or stride != 1:
            self.proj = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride=stride, bias=False),
                nn.BatchNorm(cout))

    def __call__(self, x):
        out = self.b(self.a(x))
        if self.se is not None:
            out = self.se(out)
        out = self.c(out)
        sc = x if self.proj is None else self.proj(x)
        return nn.relu(out + sc)


class RegNet(nn.Module):
    def __init__(self, w_a, w_0, w_m, depth, group_width, se_ratio=0.0,
                 num_classes=1000):
        widths, counts = _generate_widths(w_a, w_0, w_m, depth)
        self.stem = nn.Sequential(
            nn.Conv2d(3, 32, 3, stride=2, padding=1, bias=False),
            nn.BatchNorm(32), nn.Activation("relu"))
        blocks = []
        cin = 32
        for w, n in zip(widths, counts):
            gw = min(group_width, w)
            w = int(round(w / gw) * gw)
            for i in range(n):
                blocks.append(Bottleneck(cin, w, 2 if i == 0 else 1, gw,
                                         se_ratio))
                cin = w
        self.blocks = blocks
        self.pool = nn.GlobalAvgPool2d()
        self.fc = nn.Linear(cin, num_classes)

    def __call__(self, x):
        x = self.stem(x)
        for b in self.blocks:
            x = b(x)
        return self.fc(self.pool(x))


def regnetx_4gf(pretrained=False, **kw):
    return RegNet(w_a=38.65, w_0=96, w_m=2.43, depth=23, group_width=40, **kw)


def regnety_4gf(pretrained=False, **kw):
    return RegNet(w_a=31.41, w_0=96, w_m=2.24, depth=22, group_width=64,
                  se_ratio=0.25, **kw)
