"""HRNet semantic segmentation: FCN head over the concat of upsampled
branches (reference seg HRNet usage + hrnet_contrast.py:65 projection
head), NHWC."""
from __future__ import annotations

import jax.numpy as jnp

from ... import nn
from ...ops.image import interpolate
from ..backbones.hrnet import HRNet, hrnet_w18, hrnet_w48
from .layers import ConvBNReLU

__all__ = ["FCN", "HRNetW48Contrast", "hrnet_seg_w18", "hrnet_seg_w48"]


class FCNHead(nn.Module):
    def __init__(self, in_channels, num_classes, channels=None):
        channels = channels or in_channels
        self.conv = ConvBNReLU(in_channels, channels, 1, padding=0)
        self.cls = nn.Conv2d(channels, num_classes, 1)

    def __call__(self, x):
        return self.cls(self.conv(x))


class FCN(nn.Module):
    """FCN over an HRNet backbone (PaddleSeg 'FCN-HRNet' pattern)."""

    def __init__(self, num_classes=19, backbone: HRNet = None):
        self.backbone = backbone if backbone is not None else hrnet_w18()
        self.head = FCNHead(self.backbone.feat_channels[0], num_classes)

    def __call__(self, x):
        feat = self.backbone.concat_features(x)
        logits = self.head(feat)
        return interpolate(logits, size=x.shape[1:3], mode="bilinear")


class HRNetW48Contrast(nn.Module):
    """Seg head + projection head for contrastive training
    (reference hrnet_contrast.py:65)."""

    def __init__(self, num_classes=19, proj_dim=256, backbone: HRNet = None):
        self.backbone = backbone if backbone is not None else hrnet_w48()
        cin = self.backbone.feat_channels[0]
        self.seg_head = nn.Sequential(
            ConvBNReLU(cin, cin, 3), nn.Conv2d(cin, num_classes, 1))
        self.proj_head = nn.Sequential(
            nn.Conv2d(cin, cin, 1), nn.Activation("relu"),
            nn.Conv2d(cin, proj_dim, 1))

    def __call__(self, x):
        from ...core.module import is_training

        feat = self.backbone.concat_features(x)
        logits = interpolate(self.seg_head(feat), size=x.shape[1:3],
                             mode="bilinear")
        if is_training():
            proj = self.proj_head(feat)
            proj = proj / (jnp.linalg.norm(proj, axis=-1, keepdims=True) + 1e-9)
            return {"seg": logits, "embed": proj}
        return logits


def hrnet_seg_w18(num_classes=19):
    return FCN(num_classes, hrnet_w18())


def hrnet_seg_w48(num_classes=19):
    return FCN(num_classes, hrnet_w48())
