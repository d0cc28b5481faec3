"""Res2Net (reference tlxcv/models/classification/res2net.py,
paddle2tlx-converted), NHWC."""
from __future__ import annotations

import jax.numpy as jnp

from ... import nn

__all__ = ["Res2Net", "res2net50_26w_4s", "res2net101_26w_4s"]


class ConvBNReLU(nn.Module):
    def __init__(self, cin, cout, k, stride=1, act=True):
        self.conv = nn.Conv2d(cin, cout, k, stride=stride, padding=k // 2,
                              bias=False)
        self.bn = nn.BatchNorm(cout)
        self.act = act

    def __call__(self, x):
        x = self.bn(self.conv(x))
        return nn.relu(x) if self.act else x


class Bottle2neck(nn.Module):
    expansion = 4

    def __init__(self, cin, planes, stride=1, downsample=False, base_width=26,
                 scale=4):
        width = int(planes * (base_width / 64.0)) * scale
        self.scale = scale
        self.stride = stride
        self.conv1 = ConvBNReLU(cin, width, 1)
        n = max(scale - 1, 1)
        self.convs = [ConvBNReLU(width // scale, width // scale, 3, stride)
                      for _ in range(n)]
        self.pool = nn.AvgPool2d(3, stride, 1) if stride > 1 else None
        self.conv3 = ConvBNReLU(width, planes * 4, 1, act=False)
        self.downsample = (ConvBNReLU(cin, planes * 4, 1, stride, act=False)
                           if downsample else None)

    def __call__(self, x):
        out = self.conv1(x)
        sp = jnp.split(out, self.scale, axis=-1)
        outs = []
        prev = None
        for i, conv in enumerate(self.convs):
            s = sp[i] if (i == 0 or self.stride > 1) else sp[i] + prev
            prev = conv(s)
            outs.append(prev)
        last = sp[-1] if self.stride == 1 else (
            self.pool(sp[-1]) if self.pool is not None else sp[-1])
        outs.append(last)
        out = self.conv3(jnp.concatenate(outs, -1))
        identity = x if self.downsample is None else self.downsample(x)
        return nn.relu(out + identity)


class Res2Net(nn.Module):
    def __init__(self, depth=50, base_width=26, scale=4, num_classes=1000):
        counts = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}[depth]
        self.stem = nn.Sequential(
            nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False),
            nn.BatchNorm(64), nn.Activation("relu"), nn.MaxPool2d(3, 2, 1))
        blocks = []
        cin = 64
        for si, (n, planes) in enumerate(zip(counts, (64, 128, 256, 512))):
            for bi in range(n):
                stride = 2 if (bi == 0 and si > 0) else 1
                blocks.append(Bottle2neck(
                    cin, planes, stride, downsample=(bi == 0),
                    base_width=base_width, scale=scale))
                cin = planes * 4
        self.blocks = blocks
        self.pool = nn.GlobalAvgPool2d()
        self.fc = nn.Linear(cin, num_classes)

    def __call__(self, x):
        x = self.stem(x)
        for b in self.blocks:
            x = b(x)
        return self.fc(self.pool(x))


def res2net50_26w_4s(pretrained=False, **kw):
    return Res2Net(50, **kw)


def res2net101_26w_4s(pretrained=False, **kw):
    return Res2Net(101, **kw)
