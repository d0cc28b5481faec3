"""DenseNet (reference tlxcv/models/classification/densenet.py,
paddle2tlx-converted), NHWC."""
from __future__ import annotations

import jax.numpy as jnp

from ... import nn

__all__ = ["DenseNet", "densenet121", "densenet161", "densenet169",
           "densenet201", "densenet264"]

_CFGS = {
    121: (6, 12, 24, 16), 161: (6, 12, 36, 24), 169: (6, 12, 32, 32),
    201: (6, 12, 48, 32), 264: (6, 12, 64, 48),
}


class DenseLayer(nn.Module):
    def __init__(self, cin, growth_rate, bn_size, dropout):
        self.bn1 = nn.BatchNorm(cin)
        self.conv1 = nn.Conv2d(cin, bn_size * growth_rate, 1, bias=False)
        self.bn2 = nn.BatchNorm(bn_size * growth_rate)
        self.conv2 = nn.Conv2d(bn_size * growth_rate, growth_rate, 3,
                               padding=1, bias=False)
        self.dropout = nn.Dropout(dropout)

    def __call__(self, x):
        out = self.conv1(nn.relu(self.bn1(x)))
        out = self.conv2(nn.relu(self.bn2(out)))
        out = self.dropout(out)
        return jnp.concatenate([x, out], axis=-1)


class Transition(nn.Module):
    def __init__(self, cin, cout):
        self.bn = nn.BatchNorm(cin)
        self.conv = nn.Conv2d(cin, cout, 1, bias=False)
        self.pool = nn.AvgPool2d(2, 2)

    def __call__(self, x):
        return self.pool(self.conv(nn.relu(self.bn(x))))


class DenseNet(nn.Module):
    def __init__(self, layers=121, growth_rate=32, bn_size=4, dropout=0.0,
                 num_classes=1000, num_init_features=64):
        cfg = _CFGS[layers]
        if layers == 161:
            growth_rate, num_init_features = 48, 96
        self.stem = nn.Sequential(
            nn.Conv2d(3, num_init_features, 7, stride=2, padding=3, bias=False),
            nn.BatchNorm(num_init_features), nn.Activation("relu"),
            nn.MaxPool2d(3, 2, 1))
        blocks = []
        ch = num_init_features
        for i, n in enumerate(cfg):
            for _ in range(n):
                blocks.append(DenseLayer(ch, growth_rate, bn_size, dropout))
                ch += growth_rate
            if i != len(cfg) - 1:
                blocks.append(Transition(ch, ch // 2))
                ch = ch // 2
        self.blocks = blocks
        self.final_bn = nn.BatchNorm(ch)
        self.pool = nn.GlobalAvgPool2d()
        self.fc = nn.Linear(ch, num_classes)

    def __call__(self, x):
        x = self.stem(x)
        for b in self.blocks:
            x = b(x)
        x = self.pool(nn.relu(self.final_bn(x)))
        return self.fc(x)


def densenet121(pretrained=False, **kw):
    return DenseNet(121, **kw)


def densenet161(pretrained=False, **kw):
    return DenseNet(161, **kw)


def densenet169(pretrained=False, **kw):
    return DenseNet(169, **kw)


def densenet201(pretrained=False, **kw):
    return DenseNet(201, **kw)


def densenet264(pretrained=False, **kw):
    return DenseNet(264, **kw)
