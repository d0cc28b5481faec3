"""VGG family (reference tlxcv/models/classification/vgg.py), NHWC."""
from __future__ import annotations

import jax.numpy as jnp

from ... import nn
from ...core import init as I

__all__ = ["VGG", "vgg11", "vgg13", "vgg16", "vgg19"]

_CFGS = {
    "A": [64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"],
    "B": [64, 64, "M", 128, 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"],
    "D": [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M",
          512, 512, 512, "M"],
    "E": [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M", 512, 512, 512,
          512, "M", 512, 512, 512, 512, "M"],
}


class VGG(nn.Module):
    def __init__(self, cfg, batch_norm=False, num_classes=1000, dropout=0.5):
        layers = []
        cin = 3
        for v in _CFGS[cfg]:
            if v == "M":
                layers.append(nn.MaxPool2d(2, 2))
            else:
                layers.append(nn.Conv2d(cin, v, 3, padding=1))
                if batch_norm:
                    layers.append(nn.BatchNorm(v))
                layers.append(nn.Activation("relu"))
                cin = v
        self.features = nn.Sequential(*layers)
        self.pool = nn.AdaptiveAvgPool2d((7, 7))
        self.classifier = nn.Sequential(
            nn.Linear(512 * 7 * 7, 4096), nn.Activation("relu"), nn.Dropout(dropout),
            nn.Linear(4096, 4096), nn.Activation("relu"), nn.Dropout(dropout),
            nn.Linear(4096, num_classes,
                      w_init=lambda s: I.normal(s, std=0.01)),
        )

    def __call__(self, x):
        x = self.pool(self.features(x))
        x = x.reshape(x.shape[0], -1)
        return self.classifier(x)


def vgg11(pretrained=False, batch_norm=False, **kwargs):
    return VGG("A", batch_norm, **kwargs)


def vgg13(pretrained=False, batch_norm=False, **kwargs):
    return VGG("B", batch_norm, **kwargs)


def vgg16(pretrained=False, batch_norm=False, **kwargs):
    return VGG("D", batch_norm, **kwargs)


def vgg19(pretrained=False, batch_norm=False, **kwargs):
    return VGG("E", batch_norm, **kwargs)
