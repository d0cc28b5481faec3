"""DeepLabV3 / V3+ on resnet_vd (reference
tlxcv/models/segmentation/deeplab.py: DeepLabV3P :9, factories :311-345),
NHWC."""
from __future__ import annotations

import jax.numpy as jnp

from ... import nn
from ...ops.image import interpolate
from ..backbones.resnet_vd import resnet50_vd, resnet101_vd
from .layers import ASPPModule, ConvBNReLU, SeparableConvBNReLU

__all__ = ["DeepLabV3", "DeepLabV3P", "deeplabv3", "deeplabv3p"]


class DeepLabV3PHead(nn.Module):
    def __init__(self, num_classes, backbone_channels, low_level_channels,
                 aspp_ratios=(1, 12, 24, 36), aspp_out=256):
        self.aspp = ASPPModule(aspp_ratios, backbone_channels, aspp_out,
                               use_sep_conv=True)
        self.low_conv = ConvBNReLU(low_level_channels, 48, 1, padding=0)
        self.fuse1 = SeparableConvBNReLU(aspp_out + 48, 256, 3)
        self.fuse2 = SeparableConvBNReLU(256, 256, 3)
        self.classifier = nn.Conv2d(256, num_classes, 1)

    def __call__(self, low, high):
        x = self.aspp(high)
        x = interpolate(x, size=low.shape[1:3], mode="bilinear")
        low = self.low_conv(low)
        x = jnp.concatenate([x, low], -1)
        return self.classifier(self.fuse2(self.fuse1(x)))


class DeepLabV3P(nn.Module):
    def __init__(self, num_classes=19, backbone=None,
                 backbone_indices=(0, 3)):
        self.backbone = backbone if backbone is not None else resnet50_vd()
        self.indices = backbone_indices
        chs = self.backbone.feat_channels
        self.head = DeepLabV3PHead(num_classes, chs[backbone_indices[1]],
                                   chs[backbone_indices[0]])

    def __call__(self, x):
        feats = self.backbone(x)
        logits = self.head(feats[self.indices[0]], feats[self.indices[1]])
        return interpolate(logits, size=x.shape[1:3], mode="bilinear")


class DeepLabV3(nn.Module):
    def __init__(self, num_classes=19, backbone=None, backbone_index=3,
                 aspp_ratios=(1, 12, 24, 36)):
        self.backbone = backbone if backbone is not None else resnet50_vd()
        self.index = backbone_index
        self.aspp = ASPPModule(aspp_ratios,
                               self.backbone.feat_channels[backbone_index],
                               256)
        self.classifier = nn.Conv2d(256, num_classes, 1)

    def __call__(self, x):
        feats = self.backbone(x)
        logits = self.classifier(self.aspp(feats[self.index]))
        return interpolate(logits, size=x.shape[1:3], mode="bilinear")


def deeplabv3(num_classes=19, backbone="resnet50_vd", **kw):
    bb = resnet101_vd() if "101" in str(backbone) else resnet50_vd()
    return DeepLabV3(num_classes=num_classes, backbone=bb, **kw)


def deeplabv3p(num_classes=19, backbone="resnet50_vd", **kw):
    bb = resnet101_vd() if "101" in str(backbone) else resnet50_vd()
    return DeepLabV3P(num_classes=num_classes, backbone=bb, **kw)
