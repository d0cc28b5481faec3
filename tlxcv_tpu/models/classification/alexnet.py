"""AlexNet (reference tlxcv/models/classification/alexnet.py), NHWC."""
from __future__ import annotations

from ... import nn

__all__ = ["AlexNet", "alexnet"]


class AlexNet(nn.Module):
    def __init__(self, num_classes=1000, dropout=0.5):
        self.features = nn.Sequential(
            nn.Conv2d(3, 64, 11, stride=4, padding=2), nn.Activation("relu"),
            nn.MaxPool2d(3, 2),
            nn.Conv2d(64, 192, 5, padding=2), nn.Activation("relu"),
            nn.MaxPool2d(3, 2),
            nn.Conv2d(192, 384, 3, padding=1), nn.Activation("relu"),
            nn.Conv2d(384, 256, 3, padding=1), nn.Activation("relu"),
            nn.Conv2d(256, 256, 3, padding=1), nn.Activation("relu"),
            nn.MaxPool2d(3, 2),
        )
        self.avgpool = nn.AdaptiveAvgPool2d((6, 6))
        self.classifier = nn.Sequential(
            nn.Dropout(dropout), nn.Linear(256 * 6 * 6, 4096), nn.Activation("relu"),
            nn.Dropout(dropout), nn.Linear(4096, 4096), nn.Activation("relu"),
            nn.Linear(4096, num_classes),
        )

    def __call__(self, x):
        x = self.avgpool(self.features(x))
        return self.classifier(x.reshape(x.shape[0], -1))


def alexnet(pretrained=False, **kwargs):
    return AlexNet(**kwargs)
