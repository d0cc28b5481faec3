"""TNT (Transformer-in-Transformer) and PP-HGNet (reference
tlxcv/models/classification/{tnt.py, pp_hgnet.py}, paddle2tlx-converted),
NHWC."""
from __future__ import annotations

import jax.numpy as jnp

from ... import nn
from ...core import init as I
from ...core.module import Module, Param
from ...nn.attention import MultiHeadAttention
from .vision_transformer import Mlp

__all__ = ["TNT", "tnt_s", "PPHGNet", "pp_hgnet_small"]


class TNTBlock(Module):
    def __init__(self, outer_dim, inner_dim, outer_heads, inner_heads,
                 num_pixels, mlp_ratio=4.0):
        self.inner_norm1 = nn.LayerNorm(inner_dim)
        self.inner_attn = MultiHeadAttention(inner_dim, inner_heads,
                                             qkv_bias=False)
        self.inner_norm2 = nn.LayerNorm(inner_dim)
        self.inner_mlp = Mlp(inner_dim, int(inner_dim * mlp_ratio))
        self.proj_norm1 = nn.LayerNorm(inner_dim * num_pixels)
        self.proj = nn.Linear(inner_dim * num_pixels, outer_dim)
        self.proj_norm2 = nn.LayerNorm(outer_dim)
        self.outer_norm1 = nn.LayerNorm(outer_dim)
        self.outer_attn = MultiHeadAttention(outer_dim, outer_heads,
                                             qkv_bias=False)
        self.outer_norm2 = nn.LayerNorm(outer_dim)
        self.outer_mlp = Mlp(outer_dim, int(outer_dim * mlp_ratio))
        self.num_pixels = num_pixels

    def __call__(self, pixels, patches):
        # inner transformer over pixel tokens
        pixels = pixels + self.inner_attn(self.inner_norm1(pixels))
        pixels = pixels + self.inner_mlp(self.inner_norm2(pixels))
        # fold pixel info into patch tokens (skip cls token at index 0)
        b_np, n_pix, c_in = pixels.shape
        b = patches.shape[0]
        flat = pixels.reshape(b, -1, n_pix * c_in)
        upd = self.proj_norm2(self.proj(self.proj_norm1(flat)))
        patches = patches.at[:, 1:].add(upd)
        patches = patches + self.outer_attn(self.outer_norm1(patches))
        patches = patches + self.outer_mlp(self.outer_norm2(patches))
        return pixels, patches


class TNT(Module):
    def __init__(self, img_size=224, patch_size=16, inner_stride=4,
                 outer_dim=384, inner_dim=24, depth=6, outer_heads=6,
                 inner_heads=4, num_classes=1000):
        self.n_patches = (img_size // patch_size) ** 2
        self.n_pixels = (patch_size // inner_stride) ** 2
        self.pixel_embed = nn.Conv2d(3, inner_dim, 7, stride=inner_stride,
                                     padding=3)
        self.patch_size = patch_size
        self.inner_stride = inner_stride
        self.pixel_pos = Param(I.truncated_normal(
            (1, self.n_pixels, inner_dim), std=0.02))
        self.patch_pos = Param(I.truncated_normal(
            (1, self.n_patches + 1, outer_dim), std=0.02))
        self.cls_token = Param(I.truncated_normal((1, 1, outer_dim), std=0.02))
        self.norm_proj = nn.LayerNorm(self.n_pixels * inner_dim)
        self.patch_proj = nn.Linear(self.n_pixels * inner_dim, outer_dim)
        self.blocks = [TNTBlock(outer_dim, inner_dim, outer_heads,
                                inner_heads, self.n_pixels)
                       for _ in range(depth)]
        self.norm = nn.LayerNorm(outer_dim)
        self.head = nn.Linear(outer_dim, num_classes)
        self.outer_dim = outer_dim
        self.inner_dim = inner_dim

    def __call__(self, x):
        b, h, w, _ = x.shape
        p = self.patch_size
        gh, gw = h // p, w // p
        pix = self.pixel_embed(x)  # [B, H/s, W/s, inner]
        ppp = p // self.inner_stride
        pix = pix.reshape(b, gh, ppp, gw, ppp, self.inner_dim)
        pix = pix.transpose(0, 1, 3, 2, 4, 5).reshape(
            b * gh * gw, ppp * ppp, self.inner_dim)
        pix = pix + self.pixel_pos.value.astype(pix.dtype)

        flat = pix.reshape(b, gh * gw, -1)
        patches = self.patch_proj(self.norm_proj(flat))
        cls = jnp.broadcast_to(self.cls_token.value.astype(x.dtype),
                               (b, 1, self.outer_dim))
        patches = jnp.concatenate([cls, patches], 1)
        patches = patches + self.patch_pos.value.astype(patches.dtype)
        for blk in self.blocks:
            pix, patches = blk(pix, patches)
        return self.head(self.norm(patches)[:, 0])


def tnt_s(pretrained=False, **kw):
    return TNT(**kw)


class HGBlock(Module):
    """PP-HGNet block: chained 3x3 convs, dense concat, 1x1 squeeze+excite."""

    def __init__(self, cin, mid, cout, layers=6, identity=False):
        self.convs = []
        c = cin
        for _ in range(layers):
            self.convs.append(nn.Sequential(
                nn.Conv2d(c, mid, 3, padding=1, bias=False),
                nn.BatchNorm(mid), nn.Activation("relu")))
            c = mid
        total = cin + layers * mid
        self.squeeze = nn.Sequential(nn.Conv2d(total, cout, 1, bias=False),
                                     nn.BatchNorm(cout), nn.Activation("relu"))
        self.identity = identity

    def __call__(self, x):
        feats = [x]
        y = x
        for conv in self.convs:
            y = conv(y)
            feats.append(y)
        out = self.squeeze(jnp.concatenate(feats, -1))
        return out + x if self.identity else out


class PPHGNet(Module):
    def __init__(self, num_classes=1000,
                 stem_channels=(48, 48, 96),
                 stage_cfg=((96, 96, 224, 1, False),
                            (224, 128, 448, 1, True),
                            (448, 160, 512, 2, True),
                            (512, 192, 768, 1, True))):
        stem = []
        cin = 3
        for i, c in enumerate(stem_channels):
            stem.append(nn.Sequential(
                nn.Conv2d(cin, c, 3, stride=2 if i == 0 else 1, padding=1,
                          bias=False),
                nn.BatchNorm(c), nn.Activation("relu")))
            cin = c
        self.stem = nn.Sequential(*stem)
        self.pool0 = nn.MaxPool2d(3, 2, 1)
        blocks = []
        for ci, (bin_, mid, bout, n, downsample) in enumerate(stage_cfg):
            if downsample:
                blocks.append(nn.Sequential(
                    nn.Conv2d(cin, cin, 3, stride=2, padding=1, groups=cin,
                              bias=False), nn.BatchNorm(cin)))
            for bi in range(n):
                blocks.append(HGBlock(cin if bi == 0 else bout, mid, bout,
                                      identity=bi > 0))
                cin = bout
        self.blocks = blocks
        self.gap = nn.GlobalAvgPool2d(keepdims=True)
        self.last = nn.Conv2d(cin, 2048, 1)
        self.fc = nn.Linear(2048, num_classes)

    def __call__(self, x):
        x = self.pool0(self.stem(x))
        for b in self.blocks:
            x = b(x)
        x = nn.relu(self.last(self.gap(x)))
        return self.fc(x[:, 0, 0, :])


def pp_hgnet_small(pretrained=False, **kw):
    return PPHGNet(**kw)
