"""Swin Transformer (reference tlxcv/models/classification/
swin_transformer.py, paddle2tlx-converted; factories :656-683 tiny→large),
NHWC re-design.

Window partition/reverse are pure reshapes (XLA-free-transpose friendly);
the shifted-window attention mask is precomputed host-side per stage.
The attention body routes through nn.attention's single kernel boundary.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ... import nn
from ...core import init as I
from ...core.module import Module, Param
from .vision_transformer import Mlp

__all__ = ["SwinTransformer", "swin_tiny", "swin_small", "swin_base",
           "swin_large", "swin_transformer_base", "set_window_pack"]


def set_window_pack(model, pack: int):
    """Set the window-packing factor on every WindowAttention in `model`
    (see WindowAttention.pack — a compute-layout knob, parameters and
    math unchanged).  Requirements at each stage: pack must divide
    batch*num_windows; shifted blocks additionally need
    num_windows % pack == 0 (a block that can't satisfy them silently
    runs unpacked).  Returns the model."""
    for _, m in model.modules():
        if isinstance(m, WindowAttention):
            m.pack = pack
    return model


def window_partition(x, ws):
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)


def window_reverse(windows, ws, h, w):
    b = windows.shape[0] // ((h // ws) * (w // ws))
    x = windows.reshape(b, h // ws, w // ws, ws, ws, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1)


def _relative_position_index(ws):
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                  indexing="ij")).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0) + ws - 1
    return (rel[..., 0] * (2 * ws - 1) + rel[..., 1]).astype(np.int32)


def _shift_attn_mask(h, w, ws, shift):
    """Additive mask [num_windows, ws*ws, ws*ws] for shifted windows."""
    img_mask = np.zeros((1, h, w, 1), np.float32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img_mask[:, hs, wsl, :] = cnt
            cnt += 1
    mw = np.reshape(
        img_mask.reshape(1, h // ws, ws, w // ws, ws, 1)
        .transpose(0, 1, 3, 2, 4, 5), (-1, ws * ws))
    attn = mw[:, None, :] - mw[:, :, None]
    return np.where(attn != 0, -100.0, 0.0).astype(np.float32)


class WindowAttention(Module):
    """Per-window MHSA with relative-position bias.

    `pack` (layout knob, default 1 — set via `set_window_pack`): run the
    attention einsums over groups of `pack` windows fused into one
    [pack*ws², pack*ws²] attention with a block-diagonal bias (-100 on
    cross-window blocks, the same additive-mask trick the shifted
    windows already use).  Pure compute-layout change — parameters and
    math are identical (cross-window leakage is exp(-100) ≈ 0).  The
    point: a 49-token window fills ~38% of the MXU's 128-wide output
    tile, so the QK^T/AV contractions run at ~10% MXU occupancy
    (BENCHMARKS.md Swin verdict); packing 2 windows doubles useful
    MACs per MXU pass at the cost of 2x nominal FLOPs.
    """

    def __init__(self, dim, ws, num_heads, qkv_bias=True):
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.scale = self.head_dim ** -0.5
        self.ws = ws
        self.pack = 1
        self.qkv = nn.Linear(dim, dim * 3, bias=qkv_bias)
        self.proj = nn.Linear(dim, dim)
        self.rel_bias = Param(I.truncated_normal(
            ((2 * ws - 1) ** 2, num_heads), std=0.02))
        self.rel_index = _relative_position_index(ws)  # static numpy

    def _bias(self, n, dtype, p):
        bias = self.rel_bias.value[self.rel_index.reshape(-1)].reshape(
            n, n, self.num_heads).transpose(2, 0, 1)
        if p == 1:
            return bias.astype(dtype)
        big = jnp.full((self.num_heads, p * n, p * n), -100.0,
                       self.rel_bias.value.dtype)
        for i in range(p):
            big = big.at[:, i * n:(i + 1) * n, i * n:(i + 1) * n].set(bias)
        return big.astype(dtype)

    def __call__(self, x, mask=None, pack=None):
        """x: [nW*B, ws*ws, C]; mask: [nW/pack, pack*ws², pack*ws²]
        (pre-packed by SwinBlock) or [nW, ws*ws, ws*ws] or None."""
        bn, n, c = x.shape
        p = self.pack if pack is None else pack
        if p > 1:
            x = x.reshape(bn // p, p * n, c)
            bn, n = bn // p, p * n
        qkv = self.qkv(x).reshape(bn, n, 3, self.num_heads, self.head_dim)
        qkv = qkv.transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q * self.scale) @ k.transpose(0, 1, 3, 2)
        attn = attn + self._bias(self.ws * self.ws, attn.dtype, p)[None]
        if mask is not None:
            if p > 1 and mask.shape[-1] * p == n:
                # caller passed the raw per-window mask (direct use of
                # this module, e.g. profilers) — pack it in-graph:
                # diagonal blocks carry the per-window masks, zeros
                # elsewhere (cross-window -100 rides the packed bias)
                nw0, n0 = mask.shape[0], mask.shape[-1]
                m = mask.reshape(nw0 // p, p, n0, n0)
                big = jnp.zeros((nw0 // p, n, n), mask.dtype)
                for i in range(p):
                    big = big.at[:, i * n0:(i + 1) * n0,
                                 i * n0:(i + 1) * n0].set(m[:, i])
                mask = big
            nw = mask.shape[0]
            attn = attn.reshape(bn // nw, nw, self.num_heads, n, n)
            attn = attn + mask[None, :, None].astype(attn.dtype)
            attn = attn.reshape(bn, self.num_heads, n, n)
        attn = jax.nn.softmax(attn, -1)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(bn, n, c)
        if p > 1:
            out = out.reshape(bn * p, n // p, c)
        return self.proj(out)


class SwinBlock(Module):
    def __init__(self, dim, input_hw, num_heads, ws=7, shift=0, mlp_ratio=4.0,
                 qkv_bias=True, drop_path=0.0):
        h, w = input_hw
        self.input_hw = input_hw
        if min(h, w) <= ws:
            ws, shift = min(h, w), 0
        self.ws, self.shift = ws, shift
        self.norm1 = nn.LayerNorm(dim)
        self.attn = WindowAttention(dim, ws, num_heads, qkv_bias)
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = Mlp(dim, int(dim * mlp_ratio))
        self.drop_path = nn.DropPath(drop_path)
        self.attn_mask = (_shift_attn_mask(h, w, ws, shift)
                          if shift > 0 else None)
        self._packed_masks = {}  # pack -> numpy [nW/p, p*n, p*n]

    def _mask_for(self, p):
        """Shift mask packed p windows per group: per-window masks on the
        diagonal blocks, zeros off-diagonal (the cross-window -100 rides
        the packed relative-position bias)."""
        if self.attn_mask is None:
            return None
        if p == 1:
            return self.attn_mask
        if p not in self._packed_masks:
            m = self.attn_mask
            nw, n, _ = m.shape
            big = np.zeros((nw // p, p * n, p * n), np.float32)
            for i in range(nw // p):
                for k in range(p):
                    big[i, k * n:(k + 1) * n, k * n:(k + 1) * n] = m[p * i + k]
            self._packed_masks[p] = big
        return self._packed_masks[p]

    def __call__(self, x):
        h, w = self.input_hw
        b, l, c = x.shape
        shortcut = x
        x = self.norm1(x).reshape(b, h, w, c)
        if self.shift > 0:
            x = jnp.roll(x, (-self.shift, -self.shift), axis=(1, 2))
        windows = window_partition(x, self.ws)
        nw = (h // self.ws) * (w // self.ws)
        p = self.attn.pack
        if p > 1 and (windows.shape[0] % p != 0
                      or (self.attn_mask is not None and nw % p != 0)):
            p = 1  # shape-incompatible at this stage/batch — run unpacked
        mask = self._mask_for(p)
        mask = None if mask is None else jnp.asarray(mask)
        attn_windows = self.attn(windows, mask, pack=p)
        x = window_reverse(attn_windows, self.ws, h, w)
        if self.shift > 0:
            x = jnp.roll(x, (self.shift, self.shift), axis=(1, 2))
        x = shortcut + self.drop_path(x.reshape(b, l, c))
        return x + self.drop_path(self.mlp(self.norm2(x)))


class PatchMerging(Module):
    def __init__(self, input_hw, dim):
        self.input_hw = input_hw
        self.norm = nn.LayerNorm(4 * dim)
        self.reduction = nn.Linear(4 * dim, 2 * dim, bias=False)

    def __call__(self, x):
        h, w = self.input_hw
        b, l, c = x.shape
        x = x.reshape(b, h // 2, 2, w // 2, 2, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, (h // 2) * (w // 2), 4 * c)
        # order (x0, x1, x2, x3) = (even-even, odd-even, even-odd, odd-odd)
        return self.reduction(self.norm(x))


class SwinTransformer(Module):
    def __init__(self, img_size=224, patch_size=4, in_chans=3,
                 num_classes=1000, embed_dim=96, depths=(2, 2, 6, 2),
                 num_heads=(3, 6, 12, 24), window_size=7, mlp_ratio=4.0,
                 qkv_bias=True, drop_path_rate=0.1):
        self.patch_embed = nn.Conv2d(in_chans, embed_dim, patch_size,
                                     stride=patch_size)
        self.patch_norm = nn.LayerNorm(embed_dim)
        hw = (img_size // patch_size, img_size // patch_size)
        dpr = np.linspace(0, drop_path_rate, sum(depths)).tolist()
        self.stages = []
        self.mergers = []
        dim = embed_dim
        di = 0
        for si, (depth, heads) in enumerate(zip(depths, num_heads)):
            blocks = []
            for bi in range(depth):
                blocks.append(SwinBlock(
                    dim, hw, heads, window_size,
                    shift=0 if bi % 2 == 0 else window_size // 2,
                    mlp_ratio=mlp_ratio, qkv_bias=qkv_bias,
                    drop_path=dpr[di]))
                di += 1
            self.stages.append(blocks)
            if si < len(depths) - 1:
                self.mergers.append(PatchMerging(hw, dim))
                hw = (hw[0] // 2, hw[1] // 2)
                dim *= 2
        self.norm = nn.LayerNorm(dim)
        self.head = (nn.Linear(dim, num_classes) if num_classes > 0
                     else nn.Identity())
        self.num_features = dim

    def forward_features(self, x):
        x = self.patch_embed(x)
        b, h, w, c = x.shape
        x = self.patch_norm(x.reshape(b, h * w, c))
        for si, blocks in enumerate(self.stages):
            for blk in blocks:
                x = blk(x)
            if si < len(self.mergers):
                x = self.mergers[si](x)
        return jnp.mean(self.norm(x), axis=1)

    def __call__(self, x):
        return self.head(self.forward_features(x))


def swin_tiny(pretrained=False, **kw):
    return SwinTransformer(embed_dim=96, depths=(2, 2, 6, 2),
                           num_heads=(3, 6, 12, 24), **kw)


def swin_small(pretrained=False, **kw):
    return SwinTransformer(embed_dim=96, depths=(2, 2, 18, 2),
                           num_heads=(3, 6, 12, 24), **kw)


def swin_base(pretrained=False, **kw):
    return SwinTransformer(embed_dim=128, depths=(2, 2, 18, 2),
                           num_heads=(4, 8, 16, 32), **kw)


def swin_large(pretrained=False, **kw):
    return SwinTransformer(embed_dim=192, depths=(2, 2, 18, 2),
                           num_heads=(6, 12, 24, 48), **kw)


swin_transformer_base = swin_base
