"""FastFCN (JPU joint pyramid upsampling + Encoding head) — reference
tlxcv/models/segmentation/fastfcn.py (Encoding module :186), NHWC."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ... import nn
from ...core import init as I
from ...core.module import Param
from ...ops.image import interpolate
from ..backbones.resnet_vd import resnet50_vd
from .layers import AuxLayer, ConvBNReLU, SeparableConvBNReLU

__all__ = ["FastFCN", "fastfcn"]


class JPU(nn.Module):
    """Joint pyramid upsampling over C3..C5."""

    def __init__(self, in_channels, width=512):
        self.convs = [ConvBNReLU(ch, width, 3) for ch in in_channels]
        rates = (1, 2, 4, 8)
        self.dilations = [SeparableConvBNReLU(3 * width, width, 3, dilation=r)
                          for r in rates]
        self.out_channels = width * len(rates)

    def __call__(self, feats):
        feats = [conv(f) for conv, f in zip(self.convs, feats)]
        size = feats[0].shape[1:3]
        ups = [feats[0]] + [interpolate(f, size=size, mode="bilinear")
                            for f in feats[1:]]
        x = jnp.concatenate(ups, -1)
        return jnp.concatenate([d(x) for d in self.dilations], -1)


class Encoding(nn.Module):
    """Learned codebook encoding (reference fastfcn.py:186)."""

    def __init__(self, channels, num_codes=32):
        std = 1.0 / ((num_codes * channels) ** 0.5)
        self.codewords = Param(I.uniform((num_codes, channels), -std, std))
        self.scale = Param(I.uniform((num_codes,), -1, 0))
        self.num_codes = num_codes

    def __call__(self, x):
        n, h, w, c = x.shape
        flat = x.reshape(n, h * w, c)
        cw = self.codewords.value
        # residuals to each codeword: [N, HW, K, C]
        resid = flat[:, :, None, :] - cw[None, None, :, :]
        d2 = jnp.sum(resid ** 2, -1)  # [N, HW, K]
        assign = jax.nn.softmax(self.scale.value * d2, axis=-1)
        encoded = jnp.sum(assign[..., None] * resid, axis=1)  # [N, K, C]
        return nn.relu(encoded)


class EncHead(nn.Module):
    def __init__(self, in_channels, num_classes, num_codes=32, mid=512):
        self.bottleneck = ConvBNReLU(in_channels, mid, 3)
        self.encoding = Encoding(mid, num_codes)
        self.enc_bn = nn.BatchNorm(num_codes)
        self.fc = nn.Linear(mid, mid)
        self.cls = nn.Sequential(nn.Dropout(0.1), nn.Conv2d(mid, num_classes, 1))

    def __call__(self, x):
        x = self.bottleneck(x)
        en = self.encoding(x)              # [N, K, C]
        pooled = jnp.mean(en, axis=1)      # [N, C]
        gamma = nn.sigmoid(self.fc(pooled))
        x = x * gamma[:, None, None, :]
        return self.cls(x)


class FastFCN(nn.Module):
    def __init__(self, num_classes=19, backbone=None, num_codes=32,
                 enable_auxiliary_loss=False):
        self.backbone = backbone if backbone is not None else resnet50_vd(
            output_stride=32)
        chs = self.backbone.feat_channels[1:]  # C3, C4, C5
        self.jpu = JPU(chs, width=512)
        self.head = EncHead(self.jpu.out_channels, num_classes, num_codes)
        self.aux = (AuxLayer(chs[1], 256, num_classes)
                    if enable_auxiliary_loss else None)
        self.enable_aux = enable_auxiliary_loss

    def __call__(self, x):
        from ...core.module import is_training

        size = x.shape[1:3]
        feats = self.backbone(x)[1:]
        fused = self.jpu(feats)
        logits = interpolate(self.head(fused), size=size, mode="bilinear")
        if self.enable_aux and is_training():
            aux = interpolate(self.aux(feats[1]), size=size, mode="bilinear")
            return [logits, aux]
        return logits


def fastfcn(num_classes=19, **kw):
    return FastFCN(num_classes=num_classes, **kw)
