"""Kernel-verify the v5e int8 MXU ceiling (VERDICT r4 #2).

The ResNet-50 int8 north-star was closed against XLA-lowered op rates
(4096^3 int8 dot = 111 TF/s = 28% of nominal peak, probe_int8_mxu.json)
— rates that might be a TOOLCHAIN lowering ceiling rather than a
silicon one.  This probe times the hand-tiled Pallas int8 matmul
(ops/pallas/matmul.py) over a block-size sweep at:

  1. 4096^3 (the closure's ceiling shape), vs an XLA dot re-timed in
     the same session for comparability;
  2. the ResNet 1x1-conv-as-dot shape (200704x256 @ 256x256, the shape
     that held e2e int8 at 1.3-1.5x), and
  3. a bf16 twin kernel at 4096^3 — if hand-tiling moves bf16 too, the
     gap is generic lowering overhead, not an int8-mode artifact.

All timings are IN-GRAPH (K chained applications inside one jit, input
perturbed per step to defeat CSE, fetch-forced — the standalone
dispatch floor is ~0.86 ms on the axon relay, CLAUDE.md).

Results stream to probe_int8_pallas.json after EVERY config (a hung
Mosaic compile then leaves partials + the config name on stderr; run
this under `timeout` in the background — a killed hung compile can
wedge the relay ~30 min, CLAUDE.md r3).

Run: timeout 1800 python demo/image_classification/probe_int8_pallas.py
"""
import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tlxcv_tpu.ops.pallas.matmul import _kernel, int8_matmul

K_CHAIN = 32
WARMUP = 2
REPS = 5
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "probe_int8_pallas.json")
RESULTS = {}


def _save():
    with open(OUT, "w") as f:
        json.dump({k: (round(v, 1) if isinstance(v, float) else v)
                   for k, v in RESULTS.items()}, f, indent=1)


def _time_chain(op, x0, flops_per_app):
    """Median TF/s over K_CHAIN in-graph applications."""
    def body(x, k):
        y = op(x)
        if y.dtype == jnp.int32:
            y = (y >> 8).astype(jnp.int8) + k.astype(jnp.int8)
        else:
            y = y.astype(x0.dtype) + k.astype(x0.dtype)
        return y, ()

    @jax.jit
    def fn(x):
        y, _ = lax.scan(body, x, jnp.arange(K_CHAIN))
        return y

    out = fn(x0)
    float(jnp.sum(out.astype(jnp.float32)))  # compile + warm (fetch-forced)
    ts = []
    for _ in range(WARMUP + REPS):
        t0 = time.perf_counter()
        out = fn(x0)
        float(jnp.sum(out.astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
    t = sorted(ts[WARMUP:])[len(ts[WARMUP:]) // 2]
    return flops_per_app * K_CHAIN / t / 1e12


def bf16_matmul(a, b, block_m=512, block_n=512, block_k=512):
    """bf16 twin of int8_matmul (f32 accumulate) — probe-only."""
    m, k = a.shape
    _, n = b.shape
    assert m % block_m == 0 and n % block_n == 0 and k % block_k == 0

    def kern(a_ref, b_ref, o_ref, acc_ref, *, n_k):
        k_idx = pl.program_id(2)

        @pl.when(k_idx == 0)
        def _init():
            acc_ref[...] = jnp.zeros(acc_ref.shape, jnp.float32)

        acc_ref[...] += jax.lax.dot_general(
            a_ref[...], b_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        @pl.when(k_idx == n_k - 1)
        def _store():
            o_ref[...] = acc_ref[...].astype(o_ref.dtype)

    return pl.pallas_call(
        functools.partial(kern, n_k=k // block_k),
        grid=(m // block_m, n // block_n, k // block_k),
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((block_k, block_n), lambda i, j, kk: (kk, j)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(a, b)


def main():
    rng = np.random.default_rng(0)
    N = 4096
    a_i8 = jnp.asarray(rng.integers(-127, 128, size=(N, N)), jnp.int8)
    b_i8 = jnp.asarray(rng.integers(-127, 128, size=(N, N)), jnp.int8)
    fl = 2.0 * N ** 3

    # XLA reference rates, same session (relay load varies day to day)
    print("timing XLA int8 dot 4096^3 ...", file=sys.stderr, flush=True)
    RESULTS["xla_dot_int8"] = _time_chain(
        lambda x: lax.dot_general(x, b_i8, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32),
        a_i8, fl)
    _save()

    for bm, bn, bk in [(512, 512, 512), (256, 256, 256), (512, 1024, 512),
                       (1024, 512, 1024), (512, 512, 2048)]:
        name = f"pallas_dot_int8_b{bm}x{bn}x{bk}"
        print(f"COMPILING {name} ...", file=sys.stderr, flush=True)
        try:
            RESULTS[name] = _time_chain(
                lambda x, bm=bm, bn=bn, bk=bk: int8_matmul(
                    x, b_i8, block_m=bm, block_n=bn, block_k=bk),
                a_i8, fl)
        except Exception as e:
            RESULTS[name] = f"ERROR: {type(e).__name__}: {e}"[:160]
        _save()

    # bf16 twin: does hand-tiling move the bf16 rate too?
    a_bf = jnp.asarray(rng.normal(size=(N, N)), jnp.bfloat16)
    b_bf = jnp.asarray(rng.normal(size=(N, N)), jnp.bfloat16)
    print("timing XLA bf16 dot 4096^3 ...", file=sys.stderr, flush=True)
    RESULTS["xla_dot_bf16"] = _time_chain(lambda x: jnp.dot(x, b_bf),
                                          a_bf, fl)
    _save()
    print("COMPILING pallas bf16 twin ...", file=sys.stderr, flush=True)
    try:
        RESULTS["pallas_dot_bf16_b512"] = _time_chain(
            lambda x: bf16_matmul(x, b_bf), a_bf, fl)
    except Exception as e:
        RESULTS["pallas_dot_bf16_b512"] = f"ERROR: {e}"[:160]
    _save()

    # ResNet 1x1-as-dot shape: (B*H*W, C) @ (C, C), B=64 H=W=56 C=256.
    # M = 200704 = 512 * 392 exactly; K = N = 256.
    M, C = 64 * 56 * 56, 256
    x1 = jnp.asarray(rng.integers(-127, 128, size=(M, C)), jnp.int8)
    w1 = jnp.asarray(rng.integers(-127, 128, size=(C, C)), jnp.int8)
    fl1 = 2.0 * M * C * C
    print("timing XLA 1x1-as-dot ...", file=sys.stderr, flush=True)
    RESULTS["xla_1x1dot_int8"] = _time_chain(
        lambda x: lax.dot_general(x, w1, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32),
        x1, fl1)
    _save()
    for bm in (512, 1024, 4096):
        name = f"pallas_1x1dot_int8_bm{bm}"
        print(f"COMPILING {name} ...", file=sys.stderr, flush=True)
        try:
            RESULTS[name] = _time_chain(
                lambda x, bm=bm: int8_matmul(x, w1, block_m=bm, block_n=256,
                                             block_k=256),
                x1, fl1)
        except Exception as e:
            RESULTS[name] = f"ERROR: {type(e).__name__}: {e}"[:160]
        _save()

    print(json.dumps(RESULTS))


if __name__ == "__main__":
    main()
