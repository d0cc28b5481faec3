"""Can channel-packing reopen HRNet's layout-bound verdict?

The r3 HRNet-W18 roofline (BENCHMARKS.md): stages 3-4 run at ~13 TF/s
because the high-res branches carry 18/36-channel tensors — the channel
dim fills 14%/28% of the MXU's 128-lane tile.  The untried lever is the
space-to-depth CONV remap: block 2x2 pixels into channels (18ch@128²
-> 72ch@64²) and remap each stride-1 3x3 SAME conv EXACTLY into a 3x3
SAME conv in block space,

    W_blk[u+1, v+1, (a,b,c), (α,β,o)] = w[2u+a+1-α, 2v+b+1-β, c, o]

(zero where the index leaves [0,2]) — same math, 4x fewer
padded-to-128-lane MXU passes in the fully-padded cost model (spatial
shrinks 4x, channels stay inside one lane tile).  Nominal FLOPs rise 4x
(the blocked kernel is 75% structural zeros), so the win exists only if
the real lowering pads hard — which is exactly what this probe measures,
in-graph (K-chained, CSE-defeated, fetch-forced — the repo's timing
conventions), at HRNet-W18 512² b16 branch shapes:

  1. 3x3 18->18  @ 128²  vs its 2x2-blocked twin 72->72 @ 64²
  2. 3x3 36->36  @ 64²   vs its 2x1-row-blocked twin 72->72 @ 32x64
  3. 3x3 72->72  @ 32²   (the 1/16 branch, as an occupancy ladder point)

Equivalence is asserted in f32 before timing.  Writes
probe_hrnet_s2d.json.  Run: python demo/image_segmentation/probe_hrnet_s2d.py
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

K = 24
WARMUP = 2
REPS = 5
DN = ("NHWC", "HWIO", "NHWC")


def _time(fn, *args):
    jf = jax.jit(fn)
    out = jf(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    ts = []
    for _ in range(WARMUP + REPS):
        t0 = time.perf_counter()
        out = jf(*args)
        float(jnp.sum(out.astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
    return sorted(ts[WARMUP:])[len(ts[WARMUP:]) // 2]


def conv(x, w):
    return lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                    dimension_numbers=DN)


def _chain(x0, w):
    def body(x, k):
        return conv(x, w) + k.astype(x0.dtype), ()

    def fn(x):
        y, _ = lax.scan(body, x, jnp.arange(K))
        return y

    return fn


def block2x2(x):
    b, h, w, c = x.shape
    return x.reshape(b, h // 2, 2, w // 2, 2, c) \
            .transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def unblock2x2(z, c):
    b, hh, ww, _ = z.shape
    return z.reshape(b, hh, ww, 2, 2, c).transpose(0, 1, 3, 2, 4, 5) \
            .reshape(b, 2 * hh, 2 * ww, c)


def blockrows(x):
    b, h, w, c = x.shape
    return x.reshape(b, h // 2, 2, w, c).transpose(0, 1, 3, 2, 4) \
            .reshape(b, h // 2, w, 2 * c)


def unblockrows(z, c):
    b, hh, w, _ = z.shape
    return z.reshape(b, hh, w, 2, c).transpose(0, 1, 3, 2, 4) \
            .reshape(b, 2 * hh, w, c)


def remap_3x3_p2x2(w):
    """[3,3,c,o] -> [3,3,4c,4o] exact 2x2-blocked twin."""
    c, o = w.shape[2], w.shape[3]
    wb = np.zeros((3, 3, 2, 2, c, 2, 2, o), w.dtype)
    for U in range(3):
        for a in range(2):
            for al in range(2):
                d = 2 * (U - 1) + a + 1 - al
                if not 0 <= d <= 2:
                    continue
                for V in range(3):
                    for bb in range(2):
                        for be in range(2):
                            e = 2 * (V - 1) + bb + 1 - be
                            if 0 <= e <= 2:
                                wb[U, V, a, bb, :, al, be, :] = w[d, e]
    return wb.reshape(3, 3, 4 * c, 4 * o)


def remap_3x3_p2x1(w):
    """[3,3,c,o] -> [3,3,2c,2o] exact row-blocked twin."""
    c, o = w.shape[2], w.shape[3]
    wb = np.zeros((3, 3, 2, c, 2, o), w.dtype)
    for U in range(3):
        for a in range(2):
            for al in range(2):
                d = 2 * (U - 1) + a + 1 - al
                if 0 <= d <= 2:
                    wb[U, :, a, :, al, :] = w[d]
    return wb.reshape(3, 3, 2 * c, 2 * o)


def check_equivalence():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 18)).astype(np.float32))
    w = rng.normal(size=(3, 3, 18, 18)).astype(np.float32) * 0.1
    ref = conv(x, jnp.asarray(w))
    got = unblock2x2(conv(block2x2(x), jnp.asarray(remap_3x3_p2x2(w))), 18)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)
    w2 = rng.normal(size=(3, 3, 36, 36)).astype(np.float32) * 0.1
    x2 = jnp.asarray(rng.normal(size=(2, 16, 16, 36)).astype(np.float32))
    ref2 = conv(x2, jnp.asarray(w2))
    got2 = unblockrows(conv(blockrows(x2), jnp.asarray(remap_3x3_p2x1(w2))),
                       36)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref2),
                               atol=1e-4, rtol=1e-4)
    print("equivalence OK (f32)", flush=True)


def leg(name, shape, w_np, results, useful_flops):
    x = jnp.asarray(np.random.default_rng(1).normal(size=shape),
                    jnp.bfloat16)
    w = jnp.asarray(w_np, jnp.bfloat16)
    t = _time(_chain(x, w), x) / K
    tf = useful_flops / t / 1e12
    print(f"  {name:26s} {t * 1e3:7.3f} ms/conv  {tf:6.1f} useful-TF/s",
          flush=True)
    results[name] = {"ms": round(t * 1e3, 3), "useful_tflops": round(tf, 1)}
    return t


def main():
    check_equivalence()
    rng = np.random.default_rng(2)
    b = 16
    results = {}
    print(f"HRNet-W18 512² b{b} branch-conv shapes, bf16, K={K} in-graph",
          flush=True)

    w18 = rng.normal(size=(3, 3, 18, 18)).astype(np.float32) * 0.05
    fl18 = 2 * b * 128 * 128 * 9 * 18 * 18
    t_a = leg("conv18_128sq", (b, 128, 128, 18), w18, results, fl18)
    t_b = leg("conv72_64sq_blocked", (b, 64, 64, 72), remap_3x3_p2x2(w18),
              results, fl18)
    results["speedup_18ch_p2x2"] = round(t_a / t_b, 3)

    w36 = rng.normal(size=(3, 3, 36, 36)).astype(np.float32) * 0.05
    fl36 = 2 * b * 64 * 64 * 9 * 36 * 36
    t_c = leg("conv36_64sq", (b, 64, 64, 36), w36, results, fl36)
    t_d = leg("conv72_32x64_rowblocked", (b, 32, 64, 72),
              remap_3x3_p2x1(w36), results, fl36)
    results["speedup_36ch_p2x1"] = round(t_c / t_d, 3)

    w72 = rng.normal(size=(3, 3, 72, 72)).astype(np.float32) * 0.05
    fl72 = 2 * b * 32 * 32 * 9 * 72 * 72
    leg("conv72_32sq_ladder", (b, 32, 32, 72), w72, results, fl72)

    print(f"  18ch 2x2-block speedup: {results['speedup_18ch_p2x2']}x   "
          f"36ch 2x1-block speedup: {results['speedup_36ch_p2x1']}x",
          flush=True)

    # e2e A/B: the bench.py hrnet_seg config (HRNet-W18 FCN 512² b16
    # bf16 serving) with convert_hrnet_branches_to_s2d applied
    from tlxcv_tpu.core.module import pure, split
    from tlxcv_tpu.models.backbones.hrnet import (
        convert_hrnet_branches_to_s2d)
    from tlxcv_tpu.models.segmentation.hrnet_seg import hrnet_seg_w18

    def _bf16(d):
        return {k: (v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v)
                for k, v in d.items()}

    def e2e(model, x, tag):
        params, state = split(model)
        fn = pure(model)
        step = jax.jit(lambda p, s, xx, f=fn: f(p, s, xx,
                                                training=False)[0])
        args = (_bf16(params), state, x)
        t = _time(step, *args)
        ips = x.shape[0] / t
        print(f"  e2e {tag:12s} {t * 1e3:8.2f} ms = {ips:6.1f} img/s",
              flush=True)
        results[f"e2e_{tag}"] = {"ms": round(t * 1e3, 2),
                                 "img_s": round(ips, 1)}
        return ips

    model = hrnet_seg_w18(num_classes=19)
    x = jnp.asarray(rng.normal(size=(b, 512, 512, 3)), jnp.bfloat16)
    base = e2e(model, x, "orig")
    nconv = convert_hrnet_branches_to_s2d(model)
    print(f"  converted {nconv} branches", flush=True)
    blocked = e2e(model, x, "s2d_branches")
    results["e2e_speedup"] = round(blocked / base, 3)
    results["branches_converted"] = nconv
    print(f"  e2e speedup: {results['e2e_speedup']}x", flush=True)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "probe_hrnet_s2d.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
