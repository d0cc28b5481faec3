"""CSPDarkNet-53 + plain DarkNet-53 classifier heads (reference
tlxcv/models/classification/{cspdarknet.py, darknet53.py},
paddle2tlx-converted), NHWC."""
from __future__ import annotations

import jax.numpy as jnp

from ... import nn

__all__ = ["CSPDarkNet", "cspdarknet53", "DarkNet53", "darknet53_cls"]


class ConvBNMish(nn.Module):
    def __init__(self, cin, cout, k, stride=1):
        self.conv = nn.Conv2d(cin, cout, k, stride=stride, padding=k // 2,
                              bias=False)
        self.bn = nn.BatchNorm(cout)

    def __call__(self, x):
        return nn.mish(self.bn(self.conv(x)))


class ResBlock(nn.Module):
    def __init__(self, ch, hidden=None):
        hidden = hidden or ch
        self.conv1 = ConvBNMish(ch, hidden, 1)
        self.conv2 = ConvBNMish(hidden, ch, 3)

    def __call__(self, x):
        return x + self.conv2(self.conv1(x))


class CSPStage(nn.Module):
    def __init__(self, cin, cout, n, first=False):
        self.down = ConvBNMish(cin, cout, 3, stride=2)
        split = cout if first else cout // 2
        self.split1 = ConvBNMish(cout, split, 1)
        self.split2 = ConvBNMish(cout, split, 1)
        self.blocks = [ResBlock(split, cout // 2 if first else None)
                       for _ in range(n)]
        self.post = ConvBNMish(split, split, 1)
        self.fuse = ConvBNMish(split * 2, cout, 1)

    def __call__(self, x):
        x = self.down(x)
        y1 = self.split1(x)
        y2 = self.split2(x)
        for b in self.blocks:
            y2 = b(y2)
        y2 = self.post(y2)
        return self.fuse(jnp.concatenate([y1, y2], -1))


class CSPDarkNet(nn.Module):
    def __init__(self, num_classes=1000):
        self.stem = ConvBNMish(3, 32, 3)
        counts = (1, 2, 8, 8, 4)
        chans = (64, 128, 256, 512, 1024)
        self.stages = []
        cin = 32
        for i, (n, c) in enumerate(zip(counts, chans)):
            self.stages.append(CSPStage(cin, c, n, first=(i == 0)))
            cin = c
        self.pool = nn.GlobalAvgPool2d()
        self.fc = nn.Linear(1024, num_classes)

    def __call__(self, x):
        x = self.stem(x)
        for s in self.stages:
            x = s(x)
        return self.fc(self.pool(x))


def cspdarknet53(pretrained=False, **kw):
    return CSPDarkNet(**kw)


class DarkNet53(nn.Module):
    """Classifier over the detection DarkNet-53 trunk."""

    def __init__(self, num_classes=1000):
        from ..detection.backbones.darknet import DarkNet

        self.trunk = DarkNet(return_idx=(4,))
        self.pool = nn.GlobalAvgPool2d()
        self.fc = nn.Linear(1024, num_classes)

    def __call__(self, x):
        return self.fc(self.pool(self.trunk(x)[-1]))


def darknet53_cls(pretrained=False, **kw):
    return DarkNet53(**kw)
