"""GvT/Twins (alternating local-global attention) and LeViT
(reference tlxcv/models/classification/{gvt.py, levit.py},
paddle2tlx-converted), NHWC + xception_deeplab variant."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ... import nn
from ...core import init as I
from ...core.module import Module, Param
from .pvt_v2 import SRAttention, MixFFN
from .vision_transformer import Mlp

__all__ = ["TwinsSVT", "gvt_small", "LeViT", "levit_128s",
           "XceptionDeeplab", "xception_deeplab"]


class LocalAttention(Module):
    """Windowed (LSA) attention over ws x ws groups."""

    def __init__(self, dim, heads, ws):
        self.heads = heads
        self.head_dim = dim // heads
        self.scale = self.head_dim ** -0.5
        self.ws = ws
        self.qkv = nn.Linear(dim, dim * 3)
        self.proj = nn.Linear(dim, dim)

    def __call__(self, x, hw):
        h, w = hw
        b, n, c = x.shape
        ws = self.ws
        x = x.reshape(b, h // ws, ws, w // ws, ws, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)
        bn = x.shape[0]
        qkv = self.qkv(x).reshape(bn, ws * ws, 3, self.heads, self.head_dim)
        qkv = qkv.transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = jax.nn.softmax((q * self.scale) @ k.transpose(0, 1, 3, 2), -1)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(bn, ws * ws, c)
        out = out.reshape(b, h // ws, w // ws, ws, ws, c)
        out = out.transpose(0, 1, 3, 2, 4, 5).reshape(b, n, c)
        return self.proj(out)


class TwinsBlock(Module):
    def __init__(self, dim, heads, ws, sr_ratio, local=True):
        self.norm1 = nn.LayerNorm(dim)
        self.attn = (LocalAttention(dim, heads, ws) if local
                     else SRAttention(dim, heads, sr_ratio))
        self.local = local
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = Mlp(dim, dim * 4)

    def __call__(self, x, hw):
        y = self.norm1(x)
        y = self.attn(y, hw)
        x = x + y
        return x + self.mlp(self.norm2(x))


class TwinsSVT(Module):
    """Twins-SVT / GvT: alternate local and global-subsampled attention."""

    def __init__(self, dims=(64, 128, 256, 512), depths=(2, 2, 10, 4),
                 heads=(2, 4, 8, 16), wss=(7, 7, 7, 7),
                 sr_ratios=(8, 4, 2, 1), num_classes=1000):
        self.embeds = []
        self.stages = []
        cin = 3
        for i, dim in enumerate(dims):
            k, s = (4, 4) if i == 0 else (2, 2)
            self.embeds.append((nn.Conv2d(cin, dim, k, stride=s),
                                nn.LayerNorm(dim)))
            self.stages.append([
                TwinsBlock(dim, heads[i], wss[i], sr_ratios[i],
                           local=(bi % 2 == 0))
                for bi in range(depths[i])])
            cin = dim
        self.norm = nn.LayerNorm(dims[-1])
        self.head = nn.Linear(dims[-1], num_classes)

    def __call__(self, x):
        for (conv, norm), blocks in zip(self.embeds, self.stages):
            x = conv(x)
            b, h, w, c = x.shape
            x = norm(x.reshape(b, h * w, c))
            for blk in blocks:
                x = blk(x, (h, w))
            x = x.reshape(b, h, w, c)
        b, h, w, c = x.shape
        return self.head(jnp.mean(self.norm(x.reshape(b, -1, c)), 1))


def gvt_small(pretrained=False, **kw):
    return TwinsSVT(depths=(2, 2, 10, 4), **kw)


class LeViTAttention(Module):
    def __init__(self, dim, key_dim, heads, attn_ratio=2):
        self.heads = heads
        self.key_dim = key_dim
        self.d = int(attn_ratio * key_dim)
        self.scale = key_dim ** -0.5
        h = heads * (2 * key_dim + self.d)
        self.qkv = nn.Linear(dim, h)
        self.proj = nn.Linear(heads * self.d, dim)

    def __call__(self, x):
        b, n, _ = x.shape
        qkv = self.qkv(x).reshape(b, n, self.heads,
                                  2 * self.key_dim + self.d)
        q = qkv[..., :self.key_dim].transpose(0, 2, 1, 3)
        k = qkv[..., self.key_dim:2 * self.key_dim].transpose(0, 2, 1, 3)
        v = qkv[..., 2 * self.key_dim:].transpose(0, 2, 1, 3)
        attn = jax.nn.softmax((q * self.scale) @ k.transpose(0, 1, 3, 2), -1)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(b, n, -1)
        return self.proj(nn.hardswish(out))


class LeViT(Module):
    def __init__(self, embed_dims=(128, 256, 384), key_dim=16,
                 heads=(4, 6, 8), depths=(2, 3, 4), num_classes=1000):
        # conv stem: 4 stride-2 convs
        chs = [16, 32, 64, embed_dims[0]]
        stem = []
        cin = 3
        for c in chs:
            stem += [nn.Conv2d(cin, c, 3, stride=2, padding=1, bias=False),
                     nn.BatchNorm(c), nn.Activation("hardswish")]
            cin = c
        self.stem = nn.Sequential(*stem[:-1])  # no act after last
        self.stages = []
        self.downs = []
        for i, dim in enumerate(embed_dims):
            blocks = []
            for _ in range(depths[i]):
                blocks.append((LeViTAttention(dim, key_dim, heads[i]),
                               nn.Sequential(nn.Linear(dim, dim * 2),
                                             nn.Activation("hardswish"),
                                             nn.Linear(dim * 2, dim))))
            self.stages.append(blocks)
            if i < len(embed_dims) - 1:
                self.downs.append(nn.Linear(dim, embed_dims[i + 1]))
        self.head = nn.Linear(embed_dims[-1], num_classes)

    def __call__(self, x):
        x = self.stem(x)
        b, h, w, c = x.shape
        x = x.reshape(b, h * w, c)
        for i, blocks in enumerate(self.stages):
            for attn, mlp in blocks:
                x = x + attn(x)
                x = x + mlp(x)
            if i < len(self.downs):
                # subsample tokens 2x2 + project
                hh = h // (2 ** i)
                x = x.reshape(b, hh, hh, -1)[:, ::2, ::2]
                x = self.downs[i](x.reshape(b, -1, x.shape[-1]))
        return self.head(jnp.mean(x, 1))


def levit_128s(pretrained=False, **kw):
    return LeViT(embed_dims=(128, 256, 384), depths=(2, 3, 4), **kw)


class XceptionDeeplab(Module):
    """Xception-65 variant used as a DeepLab backbone head for
    classification (reference xception_deeplab.py) — separable convs with
    stride-1 exit flow."""

    def __init__(self, num_classes=1000):
        from .xception import SeparableConv, XceptionBlock

        self.stem = nn.Sequential(
            nn.Conv2d(3, 32, 3, stride=2, padding=1, bias=False),
            nn.BatchNorm(32), nn.Activation("relu"),
            nn.Conv2d(32, 64, 3, padding=1, bias=False), nn.BatchNorm(64),
            nn.Activation("relu"))
        self.entry = nn.Sequential(
            XceptionBlock(64, 128, 2, 2, start_with_relu=False),
            XceptionBlock(128, 256, 2, 2), XceptionBlock(256, 728, 2, 2))
        self.middle = [XceptionBlock(728, 728, 3) for _ in range(16)]
        self.exit1 = XceptionBlock(728, 1024, 2, 2, grow_first=False)
        self.exit2 = nn.Sequential(SeparableConv(1024, 1536),
                                   nn.Activation("relu"),
                                   SeparableConv(1536, 1536),
                                   nn.Activation("relu"),
                                   SeparableConv(1536, 2048),
                                   nn.Activation("relu"))
        self.pool = nn.GlobalAvgPool2d()
        self.fc = nn.Linear(2048, num_classes)

    def __call__(self, x):
        x = self.entry(self.stem(x))
        for blk in self.middle:
            x = blk(x)
        x = self.exit2(self.exit1(x))
        return self.fc(self.pool(x))


def xception_deeplab(pretrained=False, **kw):
    return XceptionDeeplab(**kw)
