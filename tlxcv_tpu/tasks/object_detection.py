"""Object detection task head (reference tlxcv/tasks/object_detection.py)."""
from __future__ import annotations

from .. import nn


class ObjectDetection(nn.Module):
    def __init__(self, backbone: nn.Module):
        self.backbone = backbone

    def loss_fn(self, output, target):
        return self.backbone.loss_fn(output, target)

    def __call__(self, inputs, **kwargs):
        return self.backbone(inputs, **kwargs)

    def predict(self, inputs, **kwargs):
        return self.backbone(inputs, **kwargs)
