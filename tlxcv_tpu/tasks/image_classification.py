"""Image classification task head
(reference tlxcv/tasks/image_classification.py:6-23)."""
from __future__ import annotations

import jax.numpy as jnp

from .. import nn
from ..ops.losses import softmax_cross_entropy


class ImageClassification(nn.Module):
    def __init__(self, backbone: nn.Module):
        self.backbone = backbone

    def loss_fn(self, output, target):
        return softmax_cross_entropy(output, target)

    def __call__(self, inputs):
        return self.backbone(inputs)

    def predict(self, inputs):
        return jnp.argmax(self.backbone(inputs), axis=-1)
