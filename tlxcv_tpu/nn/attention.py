"""Multi-head attention primitives.

One implementation used by every transformer model in the framework
(ViT/DeiT/Swin/TrOCR/DETR...).  ``scaled_dot_product_attention`` is the
single kernel boundary: it currently lowers to XLA einsums (which fuse
well on the MXU at CV sequence lengths of 196–1024); a Pallas
flash-attention kernel can replace its body without touching any model.
"""
from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp

from ..core import init as I
from ..core.module import Module, Param
from .layers import Dropout, Linear

__all__ = ["scaled_dot_product_attention", "MultiHeadAttention", "Attention",
           "use_flash_attention", "use_int8_attention"]

# Opt-in Pallas flash-attention path (ops/pallas/attention.py).  Measured
# verdict (BENCHMARKS.md, r3): the kernel wins the ISOLATED op at ViT-B
# attention shapes (~1.4x over the XLA two-einsum chain) but loses at
# the FULL-model level (ViT-B e2e 2,331 vs 2,981 img/s b64 — lane
# padding doubles attention FLOPs and XLA fuses qkv/proj around its own
# softmax) and at Swin's 49-token windows.  Default stays XLA; the
# kernel remains available for long-sequence regimes (win grows with S)
# via use_flash_attention(True) or per-call use_flash=True.
_FLASH_DEFAULT = False

# Opt-in dynamic-int8 attention (the serving-path complement to
# ops/quant.py, which quantizes Conv2d/Linear weights but leaves the two
# attention einsums in bf16/f32).  Both matmuls run int8 x int8 -> int32
# on the MXU with in-graph per-head (q/k/v) and per-row (softmax
# probabilities) dynamic scales — no calibration pass needed, softmax
# stays f32.  Enable globally with use_int8_attention(True) after
# quantize_weights(), or per-call with use_int8=True.
_INT8_DEFAULT = False


def use_flash_attention(enabled: bool = True):
    global _FLASH_DEFAULT
    _FLASH_DEFAULT = bool(enabled)


def use_int8_attention(enabled: bool = True):
    global _INT8_DEFAULT
    _INT8_DEFAULT = bool(enabled)


def _quant_dyn(t, eps=1e-6):
    """Symmetric per-head int8: abs-max over the trailing (seq, dim)
    axes.  Returns (int8 tensor, f32 scale broadcastable against it)."""
    s = jnp.max(jnp.abs(t.astype(jnp.float32)), axis=(-2, -1),
                keepdims=True)
    s = jnp.maximum(s, eps) / 127.0
    q = jnp.clip(jnp.round(t.astype(jnp.float32) / s), -127, 127)
    return q.astype(jnp.int8), s


def _int8_sdpa(q, k, v, mask, scale):
    qi, qs = _quant_dyn(q)
    ki, ks = _quant_dyn(k)
    attn = jnp.einsum("...qd,...kd->...qk", qi, ki,
                      preferred_element_type=jnp.int32)
    attn = attn.astype(jnp.float32) * (qs * ks * scale)
    if mask is not None:
        attn = attn + mask
    p = jax.nn.softmax(attn, axis=-1)
    # probabilities: per-row dynamic scale (rows sum to 1 but the max can
    # be ~1/S under uniform attention — a fixed 1/127 scale would lose
    # most of the mantissa there)
    ps = jnp.maximum(jnp.max(p, axis=-1, keepdims=True), 1e-6) / 127.0
    pi = jnp.round(p / ps).astype(jnp.int8)
    vi, vs = _quant_dyn(v)
    out = jnp.einsum("...qk,...kd->...qd", pi, vi,
                     preferred_element_type=jnp.int32)
    return (out.astype(jnp.float32) * (ps * vs)).astype(v.dtype)


def _flash_sdpa(q, k, v, mask, scale):
    from ..ops.pallas.attention import flash_attention

    lead = q.shape[:-2]
    s, d = q.shape[-2:]
    bh = 1
    for n in lead:
        bh *= n
    qf, kf, vf = (t.reshape(bh, t.shape[-2], d) for t in (q, k, v))
    bias = None
    if mask is not None:
        kv = k.shape[-2]
        if mask.ndim <= 2 or all(n == 1 for n in mask.shape[:-2]):
            # batch/head-invariant mask (e.g. TrOCR's causal triu):
            # pass the kernel's [1, S, S] form instead of materializing
            # a BH-times-copied bias in HBM
            bias = jnp.broadcast_to(mask, (1, s, kv)
                                    if mask.ndim <= 2
                                    else (*mask.shape[:-2], s, kv))
            bias = bias.reshape(1, s, kv)
        else:
            bias = jnp.broadcast_to(mask, (*lead, s, kv))
            bias = bias.reshape(bh, s, kv)
    # nb=16/(256,256) is the probed sweet spot at CV sequence lengths
    nb = max(1, min(16, bh))
    while bh % nb:
        nb -= 1
    out = flash_attention(qf, kf, vf, bias=bias, scale=scale,
                          block_q=256, block_k=256, nb=nb)
    return out.reshape(*lead, s, d).astype(v.dtype)


def scaled_dot_product_attention(q, k, v, mask=None, scale=None,
                                 use_flash=None, use_int8=None):
    """q,k,v: [..., heads, seq, head_dim]. mask broadcastable to
    [..., heads, q_len, k_len] (additive, -inf for disallowed)."""
    d = q.shape[-1]
    scale = (d ** -0.5) if scale is None else scale
    if use_flash is None:
        use_flash = _FLASH_DEFAULT
    if use_int8 is None:
        use_int8 = _INT8_DEFAULT
    if use_flash:
        return _flash_sdpa(q, k, v, mask, scale)
    if use_int8:
        return _int8_sdpa(q, k, v, mask, scale)
    attn = jnp.einsum("...qd,...kd->...qk", q * scale, k,
                      preferred_element_type=jnp.float32)
    if mask is not None:
        attn = attn + mask
    attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
    return jnp.einsum("...qk,...kd->...qd", attn, v)


class MultiHeadAttention(Module):
    """Packed-QKV MHA over [B, N, C] tokens (ViT-style, reference
    classification/vision_transformer.py:90 Attention)."""

    def __init__(self, dim, num_heads=8, qkv_bias=False, qk_scale=None,
                 attn_drop=0.0, proj_drop=0.0):
        assert dim % num_heads == 0
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.scale = qk_scale or self.head_dim ** -0.5
        self.qkv = Linear(dim, dim * 3, bias=qkv_bias,
                          w_init=lambda s: I.xavier_uniform(s))
        self.attn_drop = Dropout(attn_drop)
        self.proj = Linear(dim, dim, w_init=lambda s: I.xavier_uniform(s))
        self.proj_drop = Dropout(proj_drop)

    def __call__(self, x, mask=None):
        b, n, c = x.shape
        qkv = self.qkv(x).reshape(b, n, 3, self.num_heads, self.head_dim)
        qkv = jnp.transpose(qkv, (2, 0, 3, 1, 4))  # [3, B, H, N, D]
        q, k, v = qkv[0], qkv[1], qkv[2]
        out = scaled_dot_product_attention(q, k, v, mask=mask, scale=self.scale)
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(b, n, c)
        return self.proj_drop(self.proj(out))


Attention = MultiHeadAttention
