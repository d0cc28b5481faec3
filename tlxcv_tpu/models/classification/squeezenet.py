"""SqueezeNet 1.0/1.1 (reference tlxcv/models/classification/squeezenet.py,
paddle2tlx-converted), NHWC."""
from __future__ import annotations

import jax.numpy as jnp

from ... import nn

__all__ = ["SqueezeNet", "squeezenet1_0", "squeezenet1_1"]


class Fire(nn.Module):
    def __init__(self, cin, squeeze, e1, e3):
        self.squeeze = nn.Conv2d(cin, squeeze, 1)
        self.expand1 = nn.Conv2d(squeeze, e1, 1)
        self.expand3 = nn.Conv2d(squeeze, e3, 3, padding=1)

    def __call__(self, x):
        x = nn.relu(self.squeeze(x))
        return jnp.concatenate([nn.relu(self.expand1(x)),
                                nn.relu(self.expand3(x))], -1)


class SqueezeNet(nn.Module):
    def __init__(self, version="1.0", num_classes=1000, dropout=0.5):
        if version == "1.0":
            self.features = nn.Sequential(
                nn.Conv2d(3, 96, 7, stride=2), nn.Activation("relu"),
                nn.MaxPool2d(3, 2),
                Fire(96, 16, 64, 64), Fire(128, 16, 64, 64),
                Fire(128, 32, 128, 128), nn.MaxPool2d(3, 2),
                Fire(256, 32, 128, 128), Fire(256, 48, 192, 192),
                Fire(384, 48, 192, 192), Fire(384, 64, 256, 256),
                nn.MaxPool2d(3, 2), Fire(512, 64, 256, 256))
        else:
            self.features = nn.Sequential(
                nn.Conv2d(3, 64, 3, stride=2), nn.Activation("relu"),
                nn.MaxPool2d(3, 2),
                Fire(64, 16, 64, 64), Fire(128, 16, 64, 64),
                nn.MaxPool2d(3, 2),
                Fire(128, 32, 128, 128), Fire(256, 32, 128, 128),
                nn.MaxPool2d(3, 2),
                Fire(256, 48, 192, 192), Fire(384, 48, 192, 192),
                Fire(384, 64, 256, 256), Fire(512, 64, 256, 256))
        self.drop = nn.Dropout(dropout)
        self.final_conv = nn.Conv2d(512, num_classes, 1)
        self.pool = nn.GlobalAvgPool2d()

    def __call__(self, x):
        x = self.features(x)
        x = nn.relu(self.final_conv(self.drop(x)))
        return self.pool(x)


def squeezenet1_0(pretrained=False, **kw):
    return SqueezeNet("1.0", **kw)


def squeezenet1_1(pretrained=False, **kw):
    return SqueezeNet("1.1", **kw)
