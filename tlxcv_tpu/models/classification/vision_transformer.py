"""Vision Transformer (reference
tlxcv/models/classification/vision_transformer.py: Attention :90,
Block :126, PatchEmbed :178, VisionTransformer :223, factories :422-447),
NHWC patches, single attention kernel boundary (nn.attention)."""
from __future__ import annotations

import jax.numpy as jnp

from ... import nn
from ...core import init as I
from ...core.module import Param
from ...nn.attention import MultiHeadAttention

__all__ = [
    "VisionTransformer", "vit_small_patch16_224", "vit_base_patch16_224",
    "vit_base_patch16_384", "vit_base_patch32_384", "vit_large_patch16_224",
    "vit_large_patch16_384", "vit_large_patch32_384",
]


class Mlp(nn.Module):
    def __init__(self, in_features, hidden_features=None, out_features=None,
                 act="gelu", drop=0.0):
        hidden = hidden_features or in_features
        out = out_features or in_features
        self.fc1 = nn.Linear(in_features, hidden,
                             w_init=lambda s: I.xavier_uniform(s))
        self.fc2 = nn.Linear(hidden, out, w_init=lambda s: I.xavier_uniform(s))
        self.act = nn.get_activation(act)
        self.drop = nn.Dropout(drop)

    def __call__(self, x):
        x = self.drop(self.act(self.fc1(x)))
        return self.drop(self.fc2(x))


class Block(nn.Module):
    def __init__(self, dim, num_heads, mlp_ratio=4.0, qkv_bias=False,
                 qk_scale=None, drop=0.0, attn_drop=0.0, drop_path=0.0,
                 epsilon=1e-6):
        self.norm1 = nn.LayerNorm(dim, eps=epsilon)
        self.attn = MultiHeadAttention(dim, num_heads, qkv_bias, qk_scale,
                                       attn_drop, drop)
        self.drop_path = nn.DropPath(drop_path)
        self.norm2 = nn.LayerNorm(dim, eps=epsilon)
        self.mlp = Mlp(dim, int(dim * mlp_ratio), drop=drop)

    def __call__(self, x):
        x = x + self.drop_path(self.attn(self.norm1(x)))
        x = x + self.drop_path(self.mlp(self.norm2(x)))
        return x


class PatchEmbed(nn.Module):
    def __init__(self, img_size=224, patch_size=16, in_chans=3, embed_dim=768):
        img_size = (img_size, img_size) if isinstance(img_size, int) else img_size
        patch_size = (patch_size, patch_size) if isinstance(patch_size, int) else patch_size
        self.num_patches = (img_size[0] // patch_size[0]) * (img_size[1] // patch_size[1])
        self.proj = nn.Conv2d(in_chans, embed_dim, patch_size, stride=patch_size)

    def __call__(self, x):
        x = self.proj(x)  # [B, H', W', C]
        return x.reshape(x.shape[0], -1, x.shape[-1])


class VisionTransformer(nn.Module):
    def __init__(self, img_size=224, patch_size=16, in_chans=3,
                 num_classes=1000, embed_dim=768, depth=12, num_heads=12,
                 mlp_ratio=4.0, qkv_bias=False, qk_scale=None, drop_rate=0.0,
                 attn_drop_rate=0.0, drop_path_rate=0.0, epsilon=1e-6):
        self.num_classes = num_classes
        self.embed_dim = embed_dim
        self.patch_embed = PatchEmbed(img_size, patch_size, in_chans, embed_dim)
        n = self.patch_embed.num_patches
        self.pos_embed = Param(I.truncated_normal((1, n + 1, embed_dim), std=0.02))
        self.cls_token = Param(I.truncated_normal((1, 1, embed_dim), std=0.02))
        self.pos_drop = nn.Dropout(drop_rate)
        dpr = [float(x) for x in jnp.linspace(0, drop_path_rate, depth)]
        self.blocks = [
            Block(embed_dim, num_heads, mlp_ratio, qkv_bias, qk_scale,
                  drop_rate, attn_drop_rate, dpr[i], epsilon)
            for i in range(depth)]
        self.norm = nn.LayerNorm(embed_dim, eps=epsilon)
        self.head = (nn.Linear(embed_dim, num_classes,
                               w_init=lambda s: I.truncated_normal(s, std=0.02))
                     if num_classes > 0 else nn.Identity())

    def forward_features(self, x):
        b = x.shape[0]
        x = self.patch_embed(x)
        cls = jnp.broadcast_to(self.cls_token.value.astype(x.dtype),
                               (b, 1, self.embed_dim))
        x = jnp.concatenate([cls, x], axis=1)
        x = self.pos_drop(x + self.pos_embed.value.astype(x.dtype))
        for blk in self.blocks:
            x = blk(x)
        return self.norm(x)[:, 0]

    def __call__(self, x):
        return self.head(self.forward_features(x))


_CFGS = {
    "vit_small_patch16_224": dict(patch_size=16, embed_dim=768, depth=8,
                                  num_heads=8, mlp_ratio=3, qk_scale=768 ** -0.5),
    "vit_base_patch16_224": dict(patch_size=16, embed_dim=768, depth=12,
                                 num_heads=12, mlp_ratio=4, qkv_bias=True,
                                 epsilon=1e-6),
    "vit_base_patch16_384": dict(img_size=384, patch_size=16, embed_dim=768,
                                 depth=12, num_heads=12, mlp_ratio=4,
                                 qkv_bias=True, epsilon=1e-6),
    "vit_base_patch32_384": dict(img_size=384, patch_size=32, embed_dim=768,
                                 depth=12, num_heads=12, mlp_ratio=4,
                                 qkv_bias=True, epsilon=1e-6),
    "vit_large_patch16_224": dict(patch_size=16, embed_dim=1024, depth=24,
                                  num_heads=16, mlp_ratio=4, qkv_bias=True,
                                  epsilon=1e-6),
    "vit_large_patch16_384": dict(img_size=384, patch_size=16, embed_dim=1024,
                                  depth=24, num_heads=16, mlp_ratio=4,
                                  qkv_bias=True, epsilon=1e-6),
    "vit_large_patch32_384": dict(img_size=384, patch_size=32, embed_dim=1024,
                                  depth=24, num_heads=16, mlp_ratio=4,
                                  qkv_bias=True, epsilon=1e-6),
}


def _vit(arch, **kwargs):
    cfg = dict(_CFGS[arch])
    cfg.update(kwargs)
    return VisionTransformer(**cfg)


def vit_small_patch16_224(pretrained=False, **kw):
    return _vit("vit_small_patch16_224", **kw)


def vit_base_patch16_224(pretrained=False, **kw):
    return _vit("vit_base_patch16_224", **kw)


def vit_base_patch16_384(pretrained=False, **kw):
    return _vit("vit_base_patch16_384", **kw)


def vit_base_patch32_384(pretrained=False, **kw):
    return _vit("vit_base_patch32_384", **kw)


def vit_large_patch16_224(pretrained=False, **kw):
    return _vit("vit_large_patch16_224", **kw)


def vit_large_patch16_384(pretrained=False, **kw):
    return _vit("vit_large_patch16_384", **kw)


def vit_large_patch32_384(pretrained=False, **kw):
    return _vit("vit_large_patch32_384", **kw)
