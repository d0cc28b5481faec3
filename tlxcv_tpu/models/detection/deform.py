"""Deformable convolution (DCNv2) as plain XLA gathers — no custom op.

The reference README claims an fcos_dcn variant (reference
README.md:115); deformable convs there come from Paddle's CUDA op.  On
TPU the same computation decomposes into k*k bilinear samples (each 4
row-gathers) followed by one dense 1x1 matmul over the stacked taps —
expressible entirely in XLA, MXU for the contraction.

Placement note: the GPU reference configs put DCN in the ResNet C3-C5
stages; gather-heavy sampling at backbone width is the wrong trade on
TPU (gathers are row-count bound, BENCHMARKS.md), so the fcos_dcn
factory applies DCN in the detection head towers instead — same
modeling capability, TPU-sane cost.  Pass your own backbone for the
literal layout.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ... import nn
from ...core.module import Module
from .tood import _bilinear_sample

__all__ = ["DeformConv2d"]


class DeformConv2d(Module):
    """3x3 modulated deformable conv (DCNv2), stride 1, pad 1."""

    def __init__(self, c_in, c_out, kernel_size=3, modulated=True):
        k = kernel_size
        self.k = k
        self.modulated = modulated
        # offsets (and modulation masks) predicted from the input;
        # zero-initialized entirely (weights too) — the standard DCN
        # init: starts as a dense conv, offsets learned from there
        out_off = 2 * k * k + (k * k if modulated else 0)
        self.offset_conv = nn.Conv2d(c_in, out_off, 3, padding=1,
                                     w_init=lambda s: jnp.zeros(s),
                                     b_init=lambda s: jnp.zeros(s))
        # tap weights as one dense [k*k*C_in, C_out] contraction
        self.proj = nn.Conv2d(k * k * c_in, c_out, 1)

    def __call__(self, x):
        n, h, w, c = x.shape
        k = self.k
        off = self.offset_conv(x).astype(jnp.float32)
        gx = jax.lax.broadcasted_iota(jnp.float32, (n, h, w), 2)
        gy = jax.lax.broadcasted_iota(jnp.float32, (n, h, w), 1)
        taps = []
        half = (k - 1) // 2
        for ti in range(k * k):
            dy = ti // k - half
            dx = ti % k - half
            oy = off[..., 2 * ti]
            ox = off[..., 2 * ti + 1]
            v = _bilinear_sample(x.astype(jnp.float32),
                                 gx + dx + ox, gy + dy + oy)
            if self.modulated:
                m = jax.nn.sigmoid(off[..., 2 * k * k + ti])
                v = v * m[..., None]
            taps.append(v)
        stacked = jnp.concatenate(taps, -1).astype(x.dtype)
        return self.proj(stacked)
