"""Pallas int8 x int8 -> int32 blocked matmul (VERDICT r4 #2).

Purpose: kernel-level verification of the v5e int8 MXU ceiling.  XLA
lowers a 4096^3 int8 dot to 111 TF/s on this toolchain (28% of the
nominal 394 TF/s int8 peak — demo/image_classification/
probe_int8_mxu.json); the ResNet-50 int8 north-star was closed against
that figure.  This kernel asks whether hand-tiling reaches materially
higher — if yes, the 1x1-conv-as-dot serving path reopens; if no, the
closure stands on kernel evidence, not just XLA-lowered op rates.

Formulation stays inside THIS toolchain's verified Mosaic subset
(CLAUDE.md r2/r3 probes; same recipe as ops/pallas/attention.py): plain
2D blocks, 2D `dot_general` only, every lane dim a multiple of 128
(int8 min tile is (32, 128)), block-indexed BlockSpecs, K as the
innermost "arbitrary" grid dim accumulating into a VMEM scratch.

The reference has no TPU kernels at all (CUDA framework ops only);
this exists purely for the perf bar.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["int8_matmul"]


def _kernel(a_ref, b_ref, o_ref, acc_ref, *, n_k):
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _init():
        acc_ref[...] = jnp.zeros(acc_ref.shape, jnp.int32)

    acc_ref[...] += jax.lax.dot_general(
        a_ref[...], b_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)

    @pl.when(k_idx == n_k - 1)
    def _store():
        o_ref[...] = acc_ref[...]


def _pad2(x, m, n):
    pm, pn = m - x.shape[0], n - x.shape[1]
    if pm == 0 and pn == 0:
        return x
    return jnp.pad(x, ((0, pm), (0, pn)))


@functools.partial(jax.jit, static_argnames=("block_m", "block_n", "block_k",
                                             "interpret"))
def int8_matmul(a, b, block_m=512, block_n=512, block_k=512,
                interpret=False):
    """``a``: [M, K] int8, ``b``: [K, N] int8 -> [M, N] int32 (exact).

    Shapes are zero-padded up to block multiples (zero rows/cols
    contribute 0 to the integer accumulation — exact)."""
    if a.dtype != jnp.int8 or b.dtype != jnp.int8:
        raise TypeError(f"int8_matmul needs int8 operands, got "
                        f"{a.dtype}/{b.dtype}")
    m, k = a.shape
    k2, n = b.shape
    if k != k2:
        raise ValueError(f"inner dims mismatch: {a.shape} @ {b.shape}")
    mp = -(-m // block_m) * block_m
    np_ = -(-n // block_n) * block_n
    kp = -(-k // block_k) * block_k
    ap = _pad2(a, mp, kp)
    bp = _pad2(b, kp, np_)
    n_k = kp // block_k

    out = pl.pallas_call(
        functools.partial(_kernel, n_k=n_k),
        grid=(mp // block_m, np_ // block_n, n_k),
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((block_k, block_n), lambda i, j, kk: (kk, j)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.int32),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(ap, bp)
    return out[:m, :n]
