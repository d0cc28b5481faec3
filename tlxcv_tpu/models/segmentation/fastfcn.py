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
    """Learned codebook encoding (reference fastfcn.py:186-246): soft
    assignment of every pixel to K codewords, aggregated residuals.
    Returns RAW encoded features [N, K, C] — the BN-over-codes + relu
    live in :class:`EncModule`, exactly like the reference Sequential."""

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
        return jnp.sum(assign[..., None] * resid, axis=1)  # [N, K, C]


class EncModule(nn.Module):
    """Context-encoding module (reference fastfcn.py EncModule :253-291):
    1x1 project -> Encoding -> BatchNorm1d over the K codes -> relu ->
    mean over codes -> sigmoid channel gate, with the RESIDUAL gating
    ``relu(x + x * gamma)`` (round-2 fix: the earlier head skipped the
    projection, the code BN, and the residual)."""

    def __init__(self, in_channels, num_codes=32):
        self.encoding_project = ConvBNReLU(in_channels, in_channels, 1,
                                           padding=0)
        self.encoding = Encoding(in_channels, num_codes)
        self.enc_bn = nn.BatchNorm(num_codes)  # BatchNorm1d over K codes
        self.fc = nn.Linear(in_channels, in_channels)

    def __call__(self, x):
        en = self.encoding(self.encoding_project(x))     # [N, K, C]
        # BatchNorm1d(num_codes): stats over (N, C) per code
        en = nn.relu(self.enc_bn(en.transpose(0, 2, 1)).transpose(0, 2, 1))
        feat = jnp.mean(en, axis=1)                      # [N, C]
        gamma = nn.sigmoid(self.fc(feat))
        out = nn.relu(x + x * gamma[:, None, None, :])
        return feat, out


class EncHead(nn.Module):
    """(reference fastfcn.py EncNetHead :17-184).  ``from_jpu`` selects
    the 1x1 bottleneck the reference uses after JPU fusion (3x3
    otherwise); ``use_se_loss`` attaches the semantic-encoding-loss
    classifier over the encoded feature (reference default True)."""

    def __init__(self, in_channels, num_classes, num_codes=32, mid=512,
                 from_jpu=False, use_se_loss=True):
        if from_jpu:
            self.bottleneck = ConvBNReLU(in_channels, mid, 1, padding=0)
        else:
            self.bottleneck = ConvBNReLU(in_channels, mid, 3)
        self.enc_module = EncModule(mid, num_codes)
        self.cls = nn.Conv2d(mid, num_classes, 1)
        self.se_layer = (nn.Linear(mid, num_classes) if use_se_loss
                         else None)

    def __call__(self, x):
        x = self.bottleneck(x)
        feat, out = self.enc_module(x)
        logits = self.cls(out)
        if self.se_layer is not None:
            return logits, self.se_layer(feat)
        return logits


class FastFCN(nn.Module):
    def __init__(self, num_classes=19, backbone=None, num_codes=32,
                 enable_auxiliary_loss=False, use_se_loss=True):
        self.backbone = backbone if backbone is not None else resnet50_vd(
            output_stride=32)
        chs = self.backbone.feat_channels[1:]  # C3, C4, C5
        self.jpu = JPU(chs, width=512)
        self.head = EncHead(self.jpu.out_channels, num_classes, num_codes,
                            from_jpu=True, use_se_loss=use_se_loss)
        self.aux = (AuxLayer(chs[1], 256, num_classes)
                    if enable_auxiliary_loss else None)
        self.enable_aux = enable_auxiliary_loss

    def __call__(self, x):
        from ...core.module import is_training

        size = x.shape[1:3]
        feats = self.backbone(x)[1:]
        fused = self.jpu(feats)
        head_out = self.head(fused)
        logits, se = head_out if isinstance(head_out, tuple) \
            else (head_out, None)
        logits = interpolate(logits, size=size, mode="bilinear")
        # NB the reference forward returns output[0] only (its aux/se
        # heads exist in the weights but are never returned,
        # fastfcn.py:165-184); the full list is our opt-in extension.
        if is_training() and self.enable_aux:
            outs = [logits]
            outs.append(interpolate(self.aux(feats[1]), size=size,
                                    mode="bilinear"))
            if se is not None:
                outs.append(se)  # semantic-encoding-loss logits [N, C]
            return outs
        return logits


def fastfcn(num_classes=19, **kw):
    return FastFCN(num_classes=num_classes, **kw)
