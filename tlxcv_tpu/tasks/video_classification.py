"""Video classification task (reference tlxcv/tasks/video_classification.py:
BCE-with-sigmoid loss :11-13, per-frame argmax predict :18-25)."""
from __future__ import annotations

import jax.numpy as jnp

from .. import nn
from ..ops.losses import binary_cross_entropy


class VideoClassification(nn.Module):
    def __init__(self, backbone: nn.Module):
        self.backbone = backbone

    def loss_fn(self, output, target):
        return binary_cross_entropy(output, target.astype(output.dtype))

    def __call__(self, inputs):
        return self.backbone(inputs)

    def predict(self, inputs):
        logits = self.backbone(inputs)
        return jnp.argmax(logits, axis=-1)
