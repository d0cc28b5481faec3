"""CSWin Transformer (reference tlxcv/models/classification/
cswin_transformer.py, paddle2tlx-converted), NHWC.

Cross-shaped window attention: half the heads attend in horizontal
stripes, half in vertical stripes, with a locally-enhanced positional
encoding (depthwise conv on V).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ... import nn
from ...core.module import Module
from .vision_transformer import Mlp

__all__ = ["CSWinTransformer", "cswin_tiny", "cswin_small"]


class LePEAttention(Module):
    """Stripe attention for one orientation."""

    def __init__(self, dim, heads, split_size, horizontal):
        self.heads = heads
        self.head_dim = dim // heads
        self.scale = self.head_dim ** -0.5
        self.split = split_size
        self.horizontal = horizontal
        self.get_v = nn.Conv2d(dim, dim, 3, padding=1, groups=dim)

    def _stripes(self, x, h, w):
        """[B, H, W, C] -> [B*nStripes, stripe_len, C]."""
        b = x.shape[0]
        s = self.split
        if self.horizontal:
            x = x.reshape(b, h // s, s, w, -1)
            x = x.transpose(0, 1, 2, 3, 4).reshape(b * (h // s), s * w, -1)
        else:
            x = x.reshape(b, h, w // s, s, -1)
            x = x.transpose(0, 2, 1, 3, 4).reshape(b * (w // s), h * s, -1)
        return x

    def _unstripes(self, x, b, h, w):
        s = self.split
        if self.horizontal:
            x = x.reshape(b, h // s, s, w, -1)
            return x.reshape(b, h, w, -1)
        x = x.reshape(b, w // s, h, s, -1)
        return x.transpose(0, 2, 1, 3, 4).reshape(b, h, w, -1)

    def __call__(self, q, k, v, hw):
        h, w = hw
        b = q.shape[0]
        lepe = self.get_v(v.reshape(b, h, w, -1))
        qs = self._stripes(q.reshape(b, h, w, -1), h, w)
        ks = self._stripes(k.reshape(b, h, w, -1), h, w)
        vs = self._stripes(v.reshape(b, h, w, -1), h, w)
        bn, n, c = qs.shape

        def split_heads(t):
            return t.reshape(bn, n, self.heads, self.head_dim
                             ).transpose(0, 2, 1, 3)

        attn = jax.nn.softmax(
            (split_heads(qs) * self.scale) @
            split_heads(ks).transpose(0, 1, 3, 2), -1)
        out = (attn @ split_heads(vs)).transpose(0, 2, 1, 3).reshape(bn, n, c)
        out = self._unstripes(out, b, h, w) + lepe
        return out.reshape(b, h * w, c)


class CSWinBlock(Module):
    def __init__(self, dim, heads, split_size, hw, mlp_ratio=4.0, last=False):
        self.norm1 = nn.LayerNorm(dim)
        self.qkv = nn.Linear(dim, dim * 3)
        self.hw = hw
        self.last = last
        if last:
            self.attns = [LePEAttention(dim, heads, split_size, True)]
        else:
            self.attns = [LePEAttention(dim // 2, heads // 2, split_size, True),
                          LePEAttention(dim // 2, heads // 2, split_size, False)]
        self.proj = nn.Linear(dim, dim)
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = Mlp(dim, int(dim * mlp_ratio))

    def __call__(self, x):
        b, n, c = x.shape
        qkv = self.qkv(self.norm1(x)).reshape(b, n, 3, c).transpose(2, 0, 1, 3)
        q, k, v = qkv[0], qkv[1], qkv[2]
        if self.last:
            att = self.attns[0](q, k, v, self.hw)
        else:
            qh, qv = jnp.split(q, 2, -1)
            kh, kv_ = jnp.split(k, 2, -1)
            vh, vv = jnp.split(v, 2, -1)
            att = jnp.concatenate([
                self.attns[0](qh, kh, vh, self.hw),
                self.attns[1](qv, kv_, vv, self.hw)], -1)
        x = x + self.proj(att)
        return x + self.mlp(self.norm2(x))


class CSWinTransformer(Module):
    def __init__(self, img_size=224, embed_dim=64, depths=(1, 2, 21, 1),
                 heads=(2, 4, 8, 16), split_sizes=(1, 2, 7, 7),
                 num_classes=1000):
        self.stem = nn.Conv2d(3, embed_dim, 7, stride=4, padding=3)
        self.stem_norm = nn.LayerNorm(embed_dim)
        hw = img_size // 4
        self.stages = []
        self.merges = []
        dim = embed_dim
        for i, (depth, h) in enumerate(zip(depths, heads)):
            last = i == len(depths) - 1
            self.stages.append([
                CSWinBlock(dim, h, split_sizes[i], (hw, hw), last=last)
                for _ in range(depth)])
            if not last:
                self.merges.append((nn.Conv2d(dim, dim * 2, 3, stride=2,
                                              padding=1),
                                    nn.LayerNorm(dim * 2)))
                dim *= 2
                hw = (hw + 1) // 2  # k3 s2 p1 conv output size
        self.norm = nn.LayerNorm(dim)
        self.head = nn.Linear(dim, num_classes)

    def __call__(self, x):
        x = self.stem(x)
        b, h, w, c = x.shape
        x = self.stem_norm(x.reshape(b, h * w, c))
        for i, blocks in enumerate(self.stages):
            for blk in blocks:
                x = blk(x)
            if i < len(self.merges):
                conv, norm = self.merges[i]
                x = conv(x.reshape(b, h, w, -1))
                h, w = x.shape[1:3]
                x = norm(x.reshape(b, h * w, -1))
        return self.head(jnp.mean(self.norm(x), 1))


def cswin_tiny(pretrained=False, **kw):
    return CSWinTransformer(embed_dim=64, depths=(1, 2, 21, 1),
                            heads=(2, 4, 8, 16), **kw)


def cswin_small(pretrained=False, **kw):
    return CSWinTransformer(embed_dim=64, depths=(2, 4, 32, 2),
                            heads=(2, 4, 8, 16), **kw)
