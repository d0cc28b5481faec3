"""Inception-v3 (reference tlxcv/models/classification/inceptionv3.py,
paddle2tlx-converted), NHWC."""
from __future__ import annotations

import jax.numpy as jnp

from ... import nn

__all__ = ["InceptionV3", "inception_v3"]


class BasicConv(nn.Module):
    def __init__(self, cin, cout, k, stride=1, padding=0):
        self.conv = nn.Conv2d(cin, cout, k, stride=stride, padding=padding,
                              bias=False)
        self.bn = nn.BatchNorm(cout, eps=0.001)

    def __call__(self, x):
        return nn.relu(self.bn(self.conv(x)))


class InceptionA(nn.Module):
    def __init__(self, cin, pool_features):
        self.b1x1 = BasicConv(cin, 64, 1)
        self.b5x5_1 = BasicConv(cin, 48, 1)
        self.b5x5_2 = BasicConv(48, 64, 5, padding=2)
        self.b3x3_1 = BasicConv(cin, 64, 1)
        self.b3x3_2 = BasicConv(64, 96, 3, padding=1)
        self.b3x3_3 = BasicConv(96, 96, 3, padding=1)
        self.pool = nn.AvgPool2d(3, 1, 1)
        self.bpool = BasicConv(cin, pool_features, 1)

    def __call__(self, x):
        return jnp.concatenate([
            self.b1x1(x), self.b5x5_2(self.b5x5_1(x)),
            self.b3x3_3(self.b3x3_2(self.b3x3_1(x))),
            self.bpool(self.pool(x))], -1)


class InceptionB(nn.Module):
    def __init__(self, cin):
        self.b3x3 = BasicConv(cin, 384, 3, stride=2)
        self.b3x3d_1 = BasicConv(cin, 64, 1)
        self.b3x3d_2 = BasicConv(64, 96, 3, padding=1)
        self.b3x3d_3 = BasicConv(96, 96, 3, stride=2)
        self.pool = nn.MaxPool2d(3, 2)

    def __call__(self, x):
        return jnp.concatenate([
            self.b3x3(x), self.b3x3d_3(self.b3x3d_2(self.b3x3d_1(x))),
            self.pool(x)], -1)


class InceptionC(nn.Module):
    def __init__(self, cin, c7):
        self.b1x1 = BasicConv(cin, 192, 1)
        self.b7_1 = BasicConv(cin, c7, 1)
        self.b7_2 = BasicConv(c7, c7, (1, 7), padding=(0, 3))
        self.b7_3 = BasicConv(c7, 192, (7, 1), padding=(3, 0))
        self.b7d_1 = BasicConv(cin, c7, 1)
        self.b7d_2 = BasicConv(c7, c7, (7, 1), padding=(3, 0))
        self.b7d_3 = BasicConv(c7, c7, (1, 7), padding=(0, 3))
        self.b7d_4 = BasicConv(c7, c7, (7, 1), padding=(3, 0))
        self.b7d_5 = BasicConv(c7, 192, (1, 7), padding=(0, 3))
        self.pool = nn.AvgPool2d(3, 1, 1)
        self.bpool = BasicConv(cin, 192, 1)

    def __call__(self, x):
        return jnp.concatenate([
            self.b1x1(x), self.b7_3(self.b7_2(self.b7_1(x))),
            self.b7d_5(self.b7d_4(self.b7d_3(self.b7d_2(self.b7d_1(x))))),
            self.bpool(self.pool(x))], -1)


class InceptionD(nn.Module):
    def __init__(self, cin):
        self.b3_1 = BasicConv(cin, 192, 1)
        self.b3_2 = BasicConv(192, 320, 3, stride=2)
        self.b7_1 = BasicConv(cin, 192, 1)
        self.b7_2 = BasicConv(192, 192, (1, 7), padding=(0, 3))
        self.b7_3 = BasicConv(192, 192, (7, 1), padding=(3, 0))
        self.b7_4 = BasicConv(192, 192, 3, stride=2)
        self.pool = nn.MaxPool2d(3, 2)

    def __call__(self, x):
        return jnp.concatenate([
            self.b3_2(self.b3_1(x)),
            self.b7_4(self.b7_3(self.b7_2(self.b7_1(x)))), self.pool(x)], -1)


class InceptionE(nn.Module):
    def __init__(self, cin):
        self.b1x1 = BasicConv(cin, 320, 1)
        self.b3_1 = BasicConv(cin, 384, 1)
        self.b3_2a = BasicConv(384, 384, (1, 3), padding=(0, 1))
        self.b3_2b = BasicConv(384, 384, (3, 1), padding=(1, 0))
        self.b3d_1 = BasicConv(cin, 448, 1)
        self.b3d_2 = BasicConv(448, 384, 3, padding=1)
        self.b3d_3a = BasicConv(384, 384, (1, 3), padding=(0, 1))
        self.b3d_3b = BasicConv(384, 384, (3, 1), padding=(1, 0))
        self.pool = nn.AvgPool2d(3, 1, 1)
        self.bpool = BasicConv(cin, 192, 1)

    def __call__(self, x):
        b3 = self.b3_1(x)
        b3 = jnp.concatenate([self.b3_2a(b3), self.b3_2b(b3)], -1)
        b3d = self.b3d_2(self.b3d_1(x))
        b3d = jnp.concatenate([self.b3d_3a(b3d), self.b3d_3b(b3d)], -1)
        return jnp.concatenate([self.b1x1(x), b3, b3d,
                                self.bpool(self.pool(x))], -1)


class InceptionV3(nn.Module):
    def __init__(self, num_classes=1000, dropout=0.5):
        self.stem = nn.Sequential(
            BasicConv(3, 32, 3, stride=2), BasicConv(32, 32, 3),
            BasicConv(32, 64, 3, padding=1), nn.MaxPool2d(3, 2),
            BasicConv(64, 80, 1), BasicConv(80, 192, 3), nn.MaxPool2d(3, 2))
        self.blocks = [
            InceptionA(192, 32), InceptionA(256, 64), InceptionA(288, 64),
            InceptionB(288),
            InceptionC(768, 128), InceptionC(768, 160), InceptionC(768, 160),
            InceptionC(768, 192),
            InceptionD(768),
            InceptionE(1280), InceptionE(2048),
        ]
        self.pool = nn.GlobalAvgPool2d()
        self.drop = nn.Dropout(dropout)
        self.fc = nn.Linear(2048, num_classes)

    def __call__(self, x):
        x = self.stem(x)
        for b in self.blocks:
            x = b(x)
        return self.fc(self.drop(self.pool(x)))


def inception_v3(pretrained=False, **kw):
    return InceptionV3(**kw)
