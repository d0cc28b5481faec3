"""Pallas flash attention for ViT/Swin shapes (BASELINE config #2).

2D-blocked formulation designed for THIS toolchain's verified Mosaic
subset (probed r2, see CLAUDE.md): the grid is (batch*heads, q_blocks,
kv_blocks) with rank-3 inputs indexed down to 2D blocks inside the
kernel, every matmul is a plain 2D `dot_general`, and all shapes keep a
lane dim that is a multiple of 128 (head_dim is zero-padded to 128 by
the wrapper — exact for QK^T and P@V since zero lanes contribute 0).

Online-softmax per the standard flash algorithm (running max m, running
sum l, normalized accumulator), all statistics in f32.  Scores tiles
are [block_q, block_k] and never materialize in HBM.

Optional additive bias [1|BH, S, S] supports Swin's relative-position
bias + shifted-window masks.  Padded key columns are masked with a
large negative inside the kernel, so any S is accepted.

The reference has no TPU attention path at all (torch SDPA inside
paddle2tlx-converted ViT/Swin, reference
tlxcv/models/classification/vision_transformer.py:90); the XLA
two-einsum composition in nn/attention.py is the default — this kernel
exists to measure whether hand-tiling beats XLA fusion at CV sequence
lengths (chained-in-jit verdict in BENCHMARKS.md).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["flash_attention"]

_NEG = -0.7 * float(jnp.finfo(jnp.float32).max)


def _kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, m_ref, l_ref, acc_ref, *,
            scale, block_q, block_k, n_kv, s_real, nb):
    kv_idx = pl.program_id(2)

    @pl.when(kv_idx == 0)
    def _init():
        m_ref[...] = jnp.full(m_ref.shape, -jnp.inf, jnp.float32)
        l_ref[...] = jnp.zeros(l_ref.shape, jnp.float32)
        acc_ref[...] = jnp.zeros(acc_ref.shape, jnp.float32)

    # mask for padded key columns (shared across the nb sub-batch)
    col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1) \
        + kv_idx * block_k
    col_ok = col < s_real

    # static loop over the sub-batch packed into this grid cell: each
    # iteration is pure 2D work (rank-3 refs indexed to 2D — the probed
    # Mosaic-safe subset), amortizing grid/dispatch overhead nb-fold.
    for b2 in range(nb):
        q = q_ref[b2]                                  # [block_q, d]
        k = k_ref[b2]                                  # [block_k, d]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)        # [block_q, block_k]
        s = s * scale
        if bias_ref is not None:
            s = s + bias_ref[0 if bias_ref.shape[0] == 1 else b2].astype(
                jnp.float32)
            # clamp -inf bias entries: a fully-masked tile would leave
            # m = -inf and p = exp(-inf - -inf) = NaN, poisoning l/acc
            # for every later block (the sdpa mask contract is additive
            # -inf for disallowed positions)
            s = jnp.maximum(s, _NEG)
        s = jnp.where(col_ok, s, _NEG)

        m_prev = m_ref[b2][:, :1]                      # [block_q, 1]
        l_prev = l_ref[b2][:, :1]
        m_curr = jnp.max(s, axis=1, keepdims=True)     # [block_q, 1]
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next)                        # [block_q, block_k]
        l_corr = alpha * l_prev
        l_next = jnp.sum(p, axis=1, keepdims=True) + l_corr
        m_ref[b2] = jnp.broadcast_to(m_next, m_ref.shape[1:])
        l_ref[b2] = jnp.broadcast_to(l_next, l_ref.shape[1:])

        l_inv = jnp.where(l_next == 0.0, 1.0, 1.0 / l_next)
        v = v_ref[b2]                                  # [block_k, d]
        o_curr = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc_ref[b2] = acc_ref[b2] * (l_corr * l_inv) + o_curr * l_inv

        @pl.when(kv_idx == n_kv - 1)
        def _store():
            o_ref[b2] = acc_ref[b2].astype(o_ref.dtype)


def _pad_to(x, size, axis):
    pad = size - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k",
                                             "nb", "pad_d", "interpret"))
def flash_attention(q, k, v, bias=None, scale=None, block_q=128,
                    block_k=128, nb=1, pad_d=True, interpret=False):
    """q, k, v: [BH, S, D] (one row per (batch, head)).  bias: optional
    additive [BH|1, S, S].  nb packs that many BH rows into one grid
    cell (amortizes per-invocation overhead at small S).  pad_d=False
    keeps the native head_dim lane (halves QK/PV FLOPs at D=64 if the
    toolchain accepts the narrow lane).  Returns [BH, S, D]."""
    bh, s_real, d = q.shape
    if bias is not None and bias.shape[0] not in (1, bh):
        raise ValueError(f"bias leading dim {bias.shape[0]} must be 1 or "
                         f"BH={bh} (per-head bias must be pre-broadcast)")
    scale = float(d ** -0.5) if scale is None else float(scale)
    sq = -(-s_real // block_q) * block_q
    sk = -(-s_real // block_k) * block_k
    d_pad = -(-d // 128) * 128 if pad_d else d
    bh_pad = -(-bh // nb) * nb
    qp = _pad_to(_pad_to(_pad_to(q, sq, 1), d_pad, 2), bh_pad, 0)
    kp = _pad_to(_pad_to(_pad_to(k, sk, 1), d_pad, 2), bh_pad, 0)
    vp = _pad_to(_pad_to(_pad_to(v, sk, 1), d_pad, 2), bh_pad, 0)
    n_q, n_kv = sq // block_q, sk // block_k

    in_specs = [
        pl.BlockSpec((nb, block_q, d_pad), lambda b, qi, ki: (b, qi, 0)),
        pl.BlockSpec((nb, block_k, d_pad), lambda b, qi, ki: (b, ki, 0)),
        pl.BlockSpec((nb, block_k, d_pad), lambda b, qi, ki: (b, ki, 0)),
    ]
    args = [qp, kp, vp]
    kw = dict(scale=scale, block_q=block_q, block_k=block_k, n_kv=n_kv,
              s_real=s_real, nb=nb)
    if bias is not None:
        bb = bias.shape[0]
        bias_p = _pad_to(_pad_to(bias, sq, 1), sk, 2)
        if bb == 1:
            in_specs.append(pl.BlockSpec((1, block_q, block_k),
                                         lambda b, qi, ki: (0, qi, ki)))
        else:
            bias_p = _pad_to(bias_p, bh_pad, 0)
            in_specs.append(pl.BlockSpec((nb, block_q, block_k),
                                         lambda b, qi, ki: (b, qi, ki)))
        args.append(bias_p)
        kern = functools.partial(_kernel, **kw)
    else:
        kern = functools.partial(
            lambda q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, **kw2:
            _kernel(q_ref, k_ref, v_ref, None, o_ref, m_ref, l_ref, acc_ref,
                    **kw2), **kw)

    out = pl.pallas_call(
        kern,
        grid=(bh_pad // nb, n_q, n_kv),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((nb, block_q, d_pad),
                               lambda b, qi, ki: (b, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((bh_pad, sq, d_pad), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((nb, block_q, 128), jnp.float32),    # m
            pltpu.VMEM((nb, block_q, 128), jnp.float32),    # l
            pltpu.VMEM((nb, block_q, d_pad), jnp.float32),  # acc
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(*args)
    return out[:bh, :s_real, :d]
