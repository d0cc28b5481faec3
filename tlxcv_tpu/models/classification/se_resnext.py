"""SE-ResNeXt + ResNeSt split-attention (reference
tlxcv/models/classification/{se_resnext.py, resnest.py}), NHWC."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ... import nn

__all__ = ["SEResNeXt", "se_resnext50_32x4d", "ResNeSt", "resnest50"]


class SEBlock(nn.Module):
    def __init__(self, ch, reduction=16):
        self.fc1 = nn.Linear(ch, ch // reduction)
        self.fc2 = nn.Linear(ch // reduction, ch)

    def __call__(self, x):
        s = x.mean(axis=(1, 2))
        s = nn.sigmoid(self.fc2(nn.relu(self.fc1(s))))
        return x * s[:, None, None, :]


class SEResNeXtBlock(nn.Module):
    def __init__(self, cin, planes, stride=1, cardinality=32, width=4,
                 downsample=False):
        d = planes * width * cardinality // 64
        self.conv1 = nn.Sequential(nn.Conv2d(cin, d, 1, bias=False),
                                   nn.BatchNorm(d), nn.Activation("relu"))
        self.conv2 = nn.Sequential(
            nn.Conv2d(d, d, 3, stride=stride, padding=1, groups=cardinality,
                      bias=False), nn.BatchNorm(d), nn.Activation("relu"))
        self.conv3 = nn.Sequential(nn.Conv2d(d, planes * 4, 1, bias=False),
                                   nn.BatchNorm(planes * 4))
        self.se = SEBlock(planes * 4)
        self.downsample = None
        if downsample:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, planes * 4, 1, stride=stride, bias=False),
                nn.BatchNorm(planes * 4))

    def __call__(self, x):
        out = self.se(self.conv3(self.conv2(self.conv1(x))))
        identity = x if self.downsample is None else self.downsample(x)
        return nn.relu(out + identity)


class SEResNeXt(nn.Module):
    def __init__(self, depth=50, cardinality=32, width=4, num_classes=1000):
        counts = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}[depth]
        self.stem = nn.Sequential(
            nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False),
            nn.BatchNorm(64), nn.Activation("relu"), nn.MaxPool2d(3, 2, 1))
        blocks = []
        cin = 64
        for si, (n, planes) in enumerate(zip(counts, (64, 128, 256, 512))):
            for bi in range(n):
                stride = 2 if (bi == 0 and si > 0) else 1
                blocks.append(SEResNeXtBlock(cin, planes, stride, cardinality,
                                             width, downsample=(bi == 0)))
                cin = planes * 4
        self.blocks = blocks
        self.pool = nn.GlobalAvgPool2d()
        self.fc = nn.Linear(cin, num_classes)

    def __call__(self, x):
        x = self.stem(x)
        for b in self.blocks:
            x = b(x)
        return self.fc(self.pool(x))


def se_resnext50_32x4d(pretrained=False, **kw):
    return SEResNeXt(50, **kw)


class SplitAttention(nn.Module):
    """ResNeSt split-attention conv (radix=2)."""

    def __init__(self, cin, ch, radix=2, groups=1, reduction=4):
        self.radix = radix
        self.conv = nn.Sequential(
            nn.Conv2d(cin, ch * radix, 3, padding=1, groups=groups * radix,
                      bias=False),
            nn.BatchNorm(ch * radix), nn.Activation("relu"))
        inter = max(ch * radix // reduction, 32)
        self.fc1 = nn.Conv2d(ch, inter, 1, groups=groups)
        self.bn1 = nn.BatchNorm(inter)
        self.fc2 = nn.Conv2d(inter, ch * radix, 1, groups=groups)
        self.ch = ch

    def __call__(self, x):
        x = self.conv(x)
        b, h, w, _ = x.shape
        splits = x.reshape(b, h, w, self.radix, self.ch)
        gap = splits.sum(axis=3).mean(axis=(1, 2), keepdims=True)
        att = self.fc2(nn.relu(self.bn1(self.fc1(gap))))
        att = att.reshape(b, 1, 1, self.radix, self.ch)
        att = jax.nn.softmax(att, axis=3)
        return (splits * att).sum(axis=3)


class ResNeStBlock(nn.Module):
    def __init__(self, cin, planes, stride=1, downsample=False):
        self.conv1 = nn.Sequential(nn.Conv2d(cin, planes, 1, bias=False),
                                   nn.BatchNorm(planes), nn.Activation("relu"))
        self.splat = SplitAttention(planes, planes)
        self.avg = nn.AvgPool2d(3, stride, 1) if stride > 1 else None
        self.conv3 = nn.Sequential(nn.Conv2d(planes, planes * 4, 1, bias=False),
                                   nn.BatchNorm(planes * 4))
        self.downsample = None
        if downsample:
            self.downsample = nn.Sequential(
                nn.AvgPool2d(stride, stride) if stride > 1 else nn.Identity(),
                nn.Conv2d(cin, planes * 4, 1, bias=False),
                nn.BatchNorm(planes * 4))

    def __call__(self, x):
        out = self.splat(self.conv1(x))
        if self.avg is not None:
            out = self.avg(out)
        out = self.conv3(out)
        identity = x if self.downsample is None else self.downsample(x)
        return nn.relu(out + identity)


class ResNeSt(nn.Module):
    def __init__(self, depth=50, num_classes=1000):
        counts = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}[depth]
        self.stem = nn.Sequential(
            nn.Conv2d(3, 32, 3, stride=2, padding=1, bias=False),
            nn.BatchNorm(32), nn.Activation("relu"),
            nn.Conv2d(32, 32, 3, padding=1, bias=False),
            nn.BatchNorm(32), nn.Activation("relu"),
            nn.Conv2d(32, 64, 3, padding=1, bias=False),
            nn.BatchNorm(64), nn.Activation("relu"), nn.MaxPool2d(3, 2, 1))
        blocks = []
        cin = 64
        for si, (n, planes) in enumerate(zip(counts, (64, 128, 256, 512))):
            for bi in range(n):
                stride = 2 if (bi == 0 and si > 0) else 1
                blocks.append(ResNeStBlock(cin, planes, stride,
                                           downsample=(bi == 0)))
                cin = planes * 4
        self.blocks = blocks
        self.pool = nn.GlobalAvgPool2d()
        self.fc = nn.Linear(cin, num_classes)

    def __call__(self, x):
        x = self.stem(x)
        for b in self.blocks:
            x = b(x)
        return self.fc(self.pool(x))


def resnest50(pretrained=False, **kw):
    return ResNeSt(50, **kw)
