"""Image segmentation task head + metrics
(reference tlxcv/tasks/image_segmentation.py)."""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .. import nn
from ..ops.losses import softmax_cross_entropy
from ..utils.metrics import Metric


class ImageSegmentation(nn.Module):
    def __init__(self, backbone: nn.Module):
        self.backbone = backbone

    def loss_fn(self, output, target):
        """CE over NHWC logits; target is one-hot NHWC or int NHW
        (reference :12-17 transposes to NHWC first — we already are)."""
        if target.ndim == output.ndim:
            target = jnp.argmax(target, -1)
        return softmax_cross_entropy(output, target)

    def __call__(self, inputs):
        return self.backbone(inputs)

    def predict(self, inputs):
        return self.backbone(inputs)


class Accuracy(Metric):
    """Pixel accuracy over argmax (reference :27-39)."""

    def __init__(self):
        self.correct = 0
        self.total = 0

    def update(self, y_pred, y_true):
        p = np.asarray(y_pred).argmax(-1).reshape(-1)
        t = np.asarray(y_true)
        if t.ndim == np.asarray(y_pred).ndim:
            t = t.argmax(-1)
        t = t.reshape(-1)
        self.correct += int((p == t).sum())
        self.total += t.size

    def result(self):
        return self.correct / max(self.total, 1)

    def reset(self):
        self.correct = 0
        self.total = 0


def mean_iou(y_true, y_pred):
    """(reference :42-48) soft IoU over one-hot maps."""
    y_true = jnp.asarray(y_true, jnp.float64)
    y_pred = jnp.asarray(y_pred, jnp.float64)
    inter = jnp.sum(y_pred * y_true, axis=(1, 2))
    union = jnp.sum(y_pred + y_true, axis=(1, 2)) - inter
    return jnp.mean(inter / union)


def dice_coefficient(y_true, y_pred, smooth=1):
    """(reference :50-57)."""
    inter = jnp.sum(y_true * y_pred, axis=(1, 2, 3))
    union = jnp.sum(y_true, axis=(1, 2, 3)) + jnp.sum(y_pred, axis=(1, 2, 3))
    return jnp.mean((2.0 * inter + smooth) / (union + smooth), axis=0)
