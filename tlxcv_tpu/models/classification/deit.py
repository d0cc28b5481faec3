"""DeiT — distilled ViT (reference tlxcv/models/classification/deit.py and
distilled_vision_transformer.py, paddle2tlx-converted)."""
from __future__ import annotations

import jax.numpy as jnp

from ... import nn
from ...core import init as I
from ...core.module import Param
from .vision_transformer import VisionTransformer

__all__ = ["DistilledVisionTransformer", "deit_tiny", "deit_small",
           "deit_base"]


class DistilledVisionTransformer(VisionTransformer):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        n = self.patch_embed.num_patches
        self.dist_token = Param(I.truncated_normal((1, 1, self.embed_dim),
                                                   std=0.02))
        self.pos_embed = Param(I.truncated_normal((1, n + 2, self.embed_dim),
                                                  std=0.02))
        self.head_dist = nn.Linear(self.embed_dim, self.num_classes)

    def forward_features(self, x):
        b = x.shape[0]
        x = self.patch_embed(x)
        cls = jnp.broadcast_to(self.cls_token.value.astype(x.dtype),
                               (b, 1, self.embed_dim))
        dist = jnp.broadcast_to(self.dist_token.value.astype(x.dtype),
                                (b, 1, self.embed_dim))
        x = jnp.concatenate([cls, dist, x], 1)
        x = self.pos_drop(x + self.pos_embed.value.astype(x.dtype))
        for blk in self.blocks:
            x = blk(x)
        x = self.norm(x)
        return x[:, 0], x[:, 1]

    def __call__(self, x):
        feat, feat_dist = self.forward_features(x)
        out = self.head(feat)
        out_dist = self.head_dist(feat_dist)
        return (out + out_dist) / 2


def deit_tiny(pretrained=False, **kw):
    kw.setdefault("embed_dim", 192)
    kw.setdefault("depth", 12)
    kw.setdefault("num_heads", 3)
    kw.setdefault("qkv_bias", True)
    return DistilledVisionTransformer(**kw)


def deit_small(pretrained=False, **kw):
    kw.setdefault("embed_dim", 384)
    kw.setdefault("depth", 12)
    kw.setdefault("num_heads", 6)
    kw.setdefault("qkv_bias", True)
    return DistilledVisionTransformer(**kw)


def deit_base(pretrained=False, **kw):
    kw.setdefault("embed_dim", 768)
    kw.setdefault("depth", 12)
    kw.setdefault("num_heads", 12)
    kw.setdefault("qkv_bias", True)
    return DistilledVisionTransformer(**kw)


def dvt(pretrained=False, **kw):
    """Distilled ViT base (reference README.md:50 'dvt' =
    distilled_vision_transformer.py) — alias of deit_base."""
    return deit_base(pretrained=pretrained, **kw)


distilled_vision_transformer = dvt
