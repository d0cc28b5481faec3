"""ArcFace (reference tlxcv/models/face_recognition/arcface.py: ArcHead
margin :12, NormHead :53, ArcFace :62), NHWC."""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ... import nn
from ...core import init as I
from ...core.module import Param
from ..classification.resnet import ResNet

__all__ = ["ArcFace", "ArcHead", "NormHead"]


class ArcHead(nn.Module):
    def __init__(self, num_classes=10575, embed_size=128, margin=0.5,
                 logist_scale=64.0):
        self.num_classes = num_classes
        self.margin = margin
        self.logist_scale = logist_scale
        self.weight = Param(I.xavier_uniform((embed_size, num_classes)))
        self.cos_m = math.cos(margin)
        self.sin_m = math.sin(margin)
        self.th = math.cos(math.pi - margin)
        self.mm = self.sin_m * margin

    def __call__(self, embeds, labels, margin=None):
        """margin=None uses the constructor margin (baked trig consts);
        passing a scalar (python float or traced array) overrides it —
        used for margin-warmup schedules, where training starts as plain
        normalized softmax (margin 0) and ramps to the full margin (the
        from-scratch recipe; at init the full margin puts the target
        logit ~scale*sin(m)/2 below the rest and stalls early epochs)."""
        e = embeds / (jnp.linalg.norm(embeds, axis=1, keepdims=True) + 1e-9)
        w = self.weight.value
        w = w / (jnp.linalg.norm(w, axis=0, keepdims=True) + 1e-9)
        cos_t = e @ w
        if margin is None:
            cos_m, sin_m, th, mm = self.cos_m, self.sin_m, self.th, self.mm
        else:
            cos_m, sin_m = jnp.cos(margin), jnp.sin(margin)
            th, mm = jnp.cos(math.pi - margin), sin_m * margin
        sin_t = jnp.sqrt(jnp.clip(1.0 - cos_t ** 2, 0.0, 1.0))
        cos_mt = cos_t * cos_m - sin_t * sin_m
        cos_mt = jnp.where(cos_t > th, cos_mt, cos_t - mm)
        mask = jax.nn.one_hot(labels.astype(jnp.int32), self.num_classes)
        return jnp.where(mask == 1.0, cos_mt, cos_t) * self.logist_scale


class NormHead(nn.Module):
    def __init__(self, embed_size, num_classes):
        self.dense = nn.Linear(embed_size, num_classes)

    def __call__(self, x):
        return self.dense(x)


class ArcFace(nn.Module):
    def __init__(self, input_size=112, embed_size=512, logist_scale=64,
                 num_classes=10575, backbone=None):
        self.backbone = backbone if backbone is not None else ResNet(
            depth=50, num_classes=0, with_pool=False)
        feat_ch = self.backbone.feat_channels[-1]
        fh = input_size // 32
        self.bn = nn.BatchNorm(feat_ch, momentum=0.99, eps=1.001e-5)
        self.drop = nn.Dropout(0.5)
        self.dense = nn.Linear(feat_ch * fh * fh, embed_size)
        self.bn2 = nn.BatchNorm(embed_size, momentum=0.99, eps=1.001e-5)
        self.head = ArcHead(num_classes, embed_size, logist_scale=logist_scale)

    def embed(self, x):
        x = self.backbone.features(x)[-1]
        x = self.drop(self.bn(x))
        x = x.reshape(x.shape[0], -1)
        x = self.bn2(self.dense(x))
        return x / (jnp.linalg.norm(x, axis=1, keepdims=True) + 1e-9)

    def __call__(self, x, labels=None):
        e = self.embed(x)
        if labels is not None:
            return self.head(e, labels)
        return e

    def loss_fn(self, embeds, labels, margin=None):
        logits = self.head(embeds, labels, margin=margin)
        from ...ops.losses import softmax_cross_entropy

        return softmax_cross_entropy(logits, labels)
