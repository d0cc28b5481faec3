"""What does the v5e MXU actually deliver for int8 — and through which op?

profile_resnet_int8.py showed the r4 fusion work was aimed at the wrong
bottleneck: with ALL inter-layer glue removed (BN folded, producer-side
requant, int8 HBM buffers) ResNet-50 int8 still runs at ~28.5% of int8
peak, i.e. the int8 convs themselves are barely faster than bf16
(13.7k vs 12.1k img/s).  Either (a) XLA lowers integer convs somewhere
slow (VPU / f32 upcast) while integer DOTs hit the int8 MXU mode, or
(b) this chip/toolchain exposes no int8 2x at all and YOLOv3's 1.38x
int8-over-bf16 was pure weight-bandwidth relief.

Probe, all timed in-graph (K chained applications, fetch-forced):
  1. dot  4096^3           bf16 / int8->int32
  2. conv 56x56x256 3x3    bf16 / int8->int32   (ResNet hot 3x3 shape)
  3. conv 56x56x256 1x1    bf16 / int8->int32   (ResNet hot 1x1 shape)
  4. the SAME 1x1 conv expressed as a (NHW, C) x (C, C) DOT, int8
     - if 4 beats 3 materially, 1x1 convs (47% of ResNet-50 FLOPs)
       should be lowered to matmuls on the int8 serving path.

Run: python demo/image_classification/probe_int8_mxu.py
"""
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

K = 32          # chained applications inside one jit
WARMUP = 2
REPS = 5


def _time(fn, *args):
    """Median-of-REPS seconds for one jitted call (host-fetch forced —
    the axon relay's block_until_ready returns early, CLAUDE.md)."""
    jf = jax.jit(fn)
    out = jf(*args)
    float(jnp.sum(out.astype(jnp.float32)))  # compile + warm
    ts = []
    for _ in range(WARMUP + REPS):
        t0 = time.perf_counter()
        out = jf(*args)
        float(jnp.sum(out.astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
    return sorted(ts[WARMUP:])[len(ts[WARMUP:]) // 2]


def _chain(op, x0, w):
    """K applications of op, input perturbed per step to defeat CSE.
    The perturbation must preserve dtype (int8 stays int8)."""
    def body(x, k):
        y = op(x, w)
        if y.dtype == jnp.int32:
            # requantize-ish: shift back to int8 range cheaply
            y = (y >> 8).astype(jnp.int8)
            y = y + k.astype(jnp.int8)
        else:
            y = y.astype(x0.dtype) + k.astype(x0.dtype)
        # keep shapes closed under op: all probe ops map x.shape->x.shape
        return y, ()

    def fn(x):
        y, _ = lax.scan(body, x, jnp.arange(K))
        return y

    return fn


def probe(name, op, x, w, flops):
    fn = _chain(op, x, w)
    t = _time(fn, x)
    tflops = flops * K / t / 1e12
    print(f"{name:28s} {t*1e3/K:8.3f} ms/app  {tflops:7.1f} TFLOP/s",
          flush=True)
    return tflops


def main():
    rng = np.random.default_rng(0)
    results = {}

    # --- 1. square dot -------------------------------------------------
    N = 4096
    a_bf = jnp.asarray(rng.normal(size=(N, N)), jnp.bfloat16)
    w_bf = jnp.asarray(rng.normal(size=(N, N)), jnp.bfloat16)
    a_i8 = jnp.asarray(rng.integers(-127, 128, size=(N, N)), jnp.int8)
    w_i8 = jnp.asarray(rng.integers(-127, 128, size=(N, N)), jnp.int8)
    fl = 2 * N**3
    results["dot_bf16"] = probe(
        "dot 4096^3 bf16", lambda x, w: jnp.dot(x, w), a_bf, w_bf, fl)
    results["dot_int8"] = probe(
        "dot 4096^3 int8->int32",
        lambda x, w: lax.dot_general(
            x, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32), a_i8, w_i8, fl)

    # --- 2/3. convs at the ResNet hot shapes ---------------------------
    B, H, C = 64, 56, 256
    xc_bf = jnp.asarray(rng.normal(size=(B, H, H, C)), jnp.bfloat16)
    xc_i8 = jnp.asarray(rng.integers(-127, 128, size=(B, H, H, C)),
                        jnp.int8)
    for kk in (3, 1):
        wk_bf = jnp.asarray(rng.normal(size=(kk, kk, C, C)) * 0.05,
                            jnp.bfloat16)
        wk_i8 = jnp.asarray(rng.integers(-127, 128, size=(kk, kk, C, C)),
                            jnp.int8)
        fl = 2 * B * H * H * C * C * kk * kk

        def conv(x, w):
            return lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=(
                    jnp.int32 if w.dtype == jnp.int8 else None))

        results[f"conv{kk}x{kk}_bf16"] = probe(
            f"conv {H}^2x{C} {kk}x{kk} bf16", conv, xc_bf, wk_bf, fl)
        results[f"conv{kk}x{kk}_int8"] = probe(
            f"conv {H}^2x{C} {kk}x{kk} int8", conv, xc_i8, wk_i8, fl)

    # --- 4. the 1x1 conv as an explicit DOT ----------------------------
    w1_i8 = jnp.asarray(rng.integers(-127, 128, size=(C, C)), jnp.int8)
    fl = 2 * B * H * H * C * C

    def conv1_as_dot(x, w):
        y = lax.dot_general(x.reshape(-1, C), w, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
        return y.reshape(B, H, H, C)

    results["conv1x1_as_dot_int8"] = probe(
        "conv 1x1 AS DOT int8", conv1_as_dot, xc_i8, w1_i8, fl)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "probe_int8_mxu.json")
    with open(out, "w") as f:
        json.dump({k: round(v, 1) for k, v in results.items()}, f, indent=1)
    print(json.dumps({k: round(v, 1) for k, v in results.items()}))


if __name__ == "__main__":
    main()
