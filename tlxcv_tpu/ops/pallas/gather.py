"""Pallas TPU row-gather via explicit async DMA (RoIAlign's hot op).

The round-2/3 Mask R-CNN profiles pinned RoIAlign cost to XLA's dynamic
gather: packed 2KB rows move at ~20M rows/s = ~40 GB/s effective, ~5% of
v5e HBM bandwidth (BENCHMARKS.md "gather-bandwidth analysis"; the op is
`table[idx]` at ops/roi_align.py:110).  XLA lowers gathers to a generic
while-loop; this kernel instead issues one async DMA per row from an
HBM-resident table with `wave` copies in flight, the hand-managed
double-buffering XLA's gather never gets.

Formulation constraints follow the toolchain's probed Mosaic subset
(CLAUDE.md): the table stays in `pl.ANY` (HBM) and is only touched by
DMA; the output block is a plain 2D VMEM tile; indices ride scalar
prefetch (SMEM).  No reshapes, no compute — pure data movement.

gather_rows(table [N, C], idx [R] int32) -> [R, C], identical to
table[idx] for in-range indices (callers clamp; RoIAlign indices are
clamped by construction).

Compile status: see BENCHMARKS.md — verified interpret=True first per
the round-2 protocol; compile probes run with a timeout in the
background (a hung Mosaic compile can wedge the axon relay).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["gather_rows", "gather_rows_bs"]


def _kernel(idx_ref, table_ref, out_ref, sems, *, g, wave):
    i = pl.program_id(0)
    started = []
    for j in range(g):  # static unroll
        r = idx_ref[i * g + j]
        cp = pltpu.make_async_copy(
            table_ref.at[pl.ds(r, 1), :],
            out_ref.at[pl.ds(j, 1), :],
            sems.at[j % wave])
        if j >= wave:
            # throttle: at most `wave` outstanding copies per cell
            started[j - wave].wait()
        cp.start()
        started.append(cp)
    for j in range(max(0, g - wave), g):
        started[j].wait()


@functools.partial(jax.jit, static_argnames=("g", "wave", "interpret"))
def gather_rows(table, idx, g: int = 256, wave: int = 16,
                interpret: bool = False):
    """table: [N, C] (any float/int dtype), idx: [R] int32 in [0, N).

    g rows are produced per grid cell (the output VMEM tile is [g, C] —
    keep g*C*itemsize under ~2 MB); `wave` bounds in-flight DMAs.
    """
    n, c = table.shape
    r = idx.shape[0]
    r_pad = -(-r // g) * g
    idx_p = jnp.pad(idx.astype(jnp.int32), (0, r_pad - r))

    out = pl.pallas_call(
        functools.partial(_kernel, g=g, wave=wave),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(r_pad // g,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((g, c), lambda i, idx_ref: (i, 0)),
            scratch_shapes=[pltpu.SemaphoreType.DMA((wave,))],
        ),
        out_shape=jax.ShapeDtypeStruct((r_pad, c), table.dtype),
        interpret=interpret,
    )(idx_p, table)
    return out[:r]


def _bs_kernel(idx_ref, *refs, g):
    # refs = g single-row input blocks + the [g, C] output block
    ins, out_ref = refs[:-1], refs[-1]
    for j in range(g):  # static unroll, pure VMEM row copies
        out_ref[j, :] = ins[j][0, :]


@functools.partial(jax.jit, static_argnames=("g", "interpret"))
def gather_rows_bs(table, idx, g: int = 8, interpret: bool = False):
    """Row gather via scalar-prefetch-driven BlockSpec index maps
    (VERDICT r4 #8 reformulation attempt).

    The r4 kernel above hand-issues async DMAs from a `pl.ANY` table —
    rejected wholesale by this toolchain's remote Mosaic compiler
    (internal tpu_compile_helper failure, BENCHMARKS.md r4).  Here the
    pipeline itself does the fetching: the table is passed `g` times,
    each copy with a (1, C) BlockSpec whose index_map reads the
    prefetched indices (`idx_ref[i*g + j]`), so Mosaic's own grid
    pipeline issues and double-buffers every row DMA — no manual
    semaphores, no ANY-space accesses, nothing outside the subset this
    toolchain has compiled before (scalar prefetch + block-indexed
    specs are exactly the attention kernel's machinery).

    Semantics: identical to ``table[idx]`` for in-range indices.
    """
    n, c = table.shape
    r = idx.shape[0]
    r_pad = -(-r // g) * g
    idx_p = jnp.pad(idx.astype(jnp.int32), (0, r_pad - r))

    in_specs = [
        pl.BlockSpec((1, c),
                     (lambda j: lambda i, idx_ref: (idx_ref[i * g + j], 0))(j))
        for j in range(g)
    ]
    out = pl.pallas_call(
        functools.partial(_bs_kernel, g=g),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(r_pad // g,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((g, c), lambda i, idx_ref: (i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((r_pad, c), table.dtype),
        interpret=interpret,
    )(idx_p, *([table] * g))
    return out[:r]
