"""PVTv2 — Pyramid Vision Transformer v2 (reference
tlxcv/models/classification/pvt_v2.py, paddle2tlx-converted), NHWC."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ... import nn
from ...core.module import Module

__all__ = ["PVTv2", "pvt_v2_b0", "pvt_v2_b1", "pvt_v2_b2"]


class SRAttention(Module):
    """Spatial-reduction attention: kv computed on a downsampled map."""

    def __init__(self, dim, num_heads, sr_ratio=1):
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.scale = self.head_dim ** -0.5
        self.q = nn.Linear(dim, dim)
        self.kv = nn.Linear(dim, dim * 2)
        self.proj = nn.Linear(dim, dim)
        self.sr_ratio = sr_ratio
        if sr_ratio > 1:
            self.sr = nn.Conv2d(dim, dim, sr_ratio, stride=sr_ratio)
            self.norm = nn.LayerNorm(dim)

    def __call__(self, x, hw):
        b, n, c = x.shape
        h, w = hw
        q = self.q(x).reshape(b, n, self.num_heads, self.head_dim
                              ).transpose(0, 2, 1, 3)
        src = x
        if self.sr_ratio > 1:
            src = self.sr(x.reshape(b, h, w, c))
            src = self.norm(src.reshape(b, -1, c))
        kv = self.kv(src).reshape(b, -1, 2, self.num_heads, self.head_dim)
        kv = kv.transpose(2, 0, 3, 1, 4)
        k, v = kv[0], kv[1]
        attn = jax.nn.softmax((q * self.scale) @ k.transpose(0, 1, 3, 2), -1)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(b, n, c)
        return self.proj(out)


class MixFFN(Module):
    def __init__(self, dim, hidden):
        self.fc1 = nn.Linear(dim, hidden)
        self.dw = nn.Conv2d(hidden, hidden, 3, padding=1, groups=hidden)
        self.fc2 = nn.Linear(hidden, dim)

    def __call__(self, x, hw):
        b, n, c = x.shape
        h, w = hw
        y = self.fc1(x)
        y = self.dw(y.reshape(b, h, w, -1)).reshape(b, n, -1)
        return self.fc2(nn.gelu(y))


class PVTBlock(Module):
    def __init__(self, dim, num_heads, mlp_ratio, sr_ratio):
        self.norm1 = nn.LayerNorm(dim)
        self.attn = SRAttention(dim, num_heads, sr_ratio)
        self.norm2 = nn.LayerNorm(dim)
        self.ffn = MixFFN(dim, int(dim * mlp_ratio))

    def __call__(self, x, hw):
        x = x + self.attn(self.norm1(x), hw)
        return x + self.ffn(self.norm2(x), hw)


class PVTv2(Module):
    def __init__(self, dims=(32, 64, 160, 256), depths=(2, 2, 2, 2),
                 num_heads=(1, 2, 5, 8), sr_ratios=(8, 4, 2, 1),
                 mlp_ratios=(8, 8, 4, 4), num_classes=1000):
        self.embeds = []
        self.norms_in = []
        self.stages = []
        self.norms_out = []
        cin = 3
        for i, dim in enumerate(dims):
            k, s = (7, 4) if i == 0 else (3, 2)
            self.embeds.append(nn.Conv2d(cin, dim, k, stride=s, padding=k // 2))
            self.norms_in.append(nn.LayerNorm(dim))
            self.stages.append([PVTBlock(dim, num_heads[i], mlp_ratios[i],
                                         sr_ratios[i])
                                for _ in range(depths[i])])
            self.norms_out.append(nn.LayerNorm(dim))
            cin = dim
        self.head = nn.Linear(dims[-1], num_classes)

    def __call__(self, x):
        for embed, nin, blocks, nout in zip(self.embeds, self.norms_in,
                                            self.stages, self.norms_out):
            x = embed(x)
            b, h, w, c = x.shape
            seq = nin(x.reshape(b, h * w, c))
            for blk in blocks:
                seq = blk(seq, (h, w))
            x = nout(seq).reshape(b, h, w, c)
        return self.head(jnp.mean(x, axis=(1, 2)))


def pvt_v2_b0(pretrained=False, **kw):
    return PVTv2(dims=(32, 64, 160, 256), depths=(2, 2, 2, 2), **kw)


def pvt_v2_b1(pretrained=False, **kw):
    return PVTv2(dims=(64, 128, 320, 512), depths=(2, 2, 2, 2), **kw)


def pvt_v2_b2(pretrained=False, **kw):
    return PVTv2(dims=(64, 128, 320, 512), depths=(3, 4, 6, 3), **kw)
