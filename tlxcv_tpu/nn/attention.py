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
           "use_flash_attention"]

# Opt-in Pallas flash-attention path (ops/pallas/attention.py).  Measured
# verdict (BENCHMARKS.md, r3): the kernel wins the ISOLATED op at ViT-B
# attention shapes (~1.4x over the XLA two-einsum chain) but loses at
# the FULL-model level (ViT-B e2e 2,331 vs 2,981 img/s b64 — lane
# padding doubles attention FLOPs and XLA fuses qkv/proj around its own
# softmax) and at Swin's 49-token windows.  Default stays XLA; the
# kernel remains available for long-sequence regimes (win grows with S)
# via use_flash_attention(True) or per-call use_flash=True.
_FLASH_DEFAULT = False


def use_flash_attention(enabled: bool = True):
    global _FLASH_DEFAULT
    _FLASH_DEFAULT = bool(enabled)


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
                                 use_flash=None):
    """q,k,v: [..., heads, seq, head_dim]. mask broadcastable to
    [..., heads, q_len, k_len] (additive, -inf for disallowed)."""
    d = q.shape[-1]
    scale = (d ** -0.5) if scale is None else scale
    if use_flash is None:
        use_flash = _FLASH_DEFAULT
    if use_flash:
        return _flash_sdpa(q, k, v, mask, scale)
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
