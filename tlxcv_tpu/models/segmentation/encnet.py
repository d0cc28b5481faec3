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
                 enable_auxiliary_loss=False, use_se_loss=True):
        self.backbone = backbone if backbone is not None else resnet50_vd()
        ch = self.backbone.feat_channels[-1]
        self.head = EncHead(ch, num_classes, num_codes,
                            use_se_loss=use_se_loss)
        self.aux = (AuxLayer(self.backbone.feat_channels[2], 256, num_classes)
                    if enable_auxiliary_loss else None)
        self.enable_aux = enable_auxiliary_loss

    def __call__(self, x):
        from ...core.module import is_training

        size = x.shape[1:3]
        feats = self.backbone(x)
        head_out = self.head(feats[-1])
        logits, se = head_out if isinstance(head_out, tuple) \
            else (head_out, None)
        logits = interpolate(logits, size=size, mode="bilinear")
        # NB the reference forward returns output[0] only (its aux/se
        # heads exist in the weights but are never returned,
        # fastfcn.py:165-184); the full list is our opt-in extension.
        if is_training() and self.enable_aux:
            outs = [logits]
            outs.append(interpolate(self.aux(feats[2]), size=size,
                                    mode="bilinear"))
            if se is not None:
                outs.append(se)
            return outs
        return logits
