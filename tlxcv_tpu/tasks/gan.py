"""GAN task head (reference tlxcv/tasks/gan.py:7-21)."""
from __future__ import annotations

from .. import nn


class GAN(nn.Module):
    def __init__(self, backbone: nn.Module):
        self.backbone = backbone

    def __call__(self, inputs):
        return self.backbone(inputs)

    def d_loss(self, real, fake):
        return self.backbone.d_loss(real, fake)

    def g_loss(self, fake):
        return self.backbone.g_loss(fake)

    def predict(self, inputs):
        return self.backbone(inputs)
