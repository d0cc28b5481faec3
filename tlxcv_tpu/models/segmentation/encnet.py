"""ENCNet — context encoding segmentation (reference
tlxcv/models/segmentation/encnet.py, not exported there but present), NHWC.
Shares the Encoding head with FastFCN."""
from __future__ import annotations

from ... import nn
from ...ops.image import interpolate
from ..backbones.resnet_vd import resnet50_vd
from .fastfcn import EncHead
from .layers import AuxLayer

__all__ = ["ENCNet"]


class ENCNet(nn.Module):
    def __init__(self, num_classes=19, backbone=None, num_codes=32,
                 enable_auxiliary_loss=False):
        self.backbone = backbone if backbone is not None else resnet50_vd()
        ch = self.backbone.feat_channels[-1]
        self.head = EncHead(ch, num_classes, num_codes)
        self.aux = (AuxLayer(self.backbone.feat_channels[2], 256, num_classes)
                    if enable_auxiliary_loss else None)
        self.enable_aux = enable_auxiliary_loss

    def __call__(self, x):
        from ...core.module import is_training

        size = x.shape[1:3]
        feats = self.backbone(x)
        logits = interpolate(self.head(feats[-1]), size=size, mode="bilinear")
        if self.enable_aux and is_training():
            aux = interpolate(self.aux(feats[2]), size=size, mode="bilinear")
            return [logits, aux]
        return logits
