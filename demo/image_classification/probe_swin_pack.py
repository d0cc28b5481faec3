"""Packed-window Swin attention A/B (reopens the r4 "layout-bound" verdict).

The r4 Swin-B verdict (BENCHMARKS.md): attention einsums are 78% of
runtime because 49-token windows fill ~38% of the MXU's 128-wide tiles
(~10% occupancy); "the fix would be a different architecture config".
This probe tests the one layout lever that keeps the architecture
EXACT: `set_window_pack(model, p)` fuses p windows per attention call
behind a block-diagonal -100 bias (the shifted-window mask trick), so
each MXU pass carries p windows' useful MACs at the cost of p× nominal
FLOPs + p× softmax elements.  p=2 keeps M=N=98 inside one 128-lane
tile (useful-MACs/pass ×2); p=4 spans 2×2 tiles (theory says wash).

Measures full Swin-B b128 bf16 serving at p ∈ {1,2,4} with fetch-true
timing (relay `block_until_ready` returns early — CLAUDE.md), checks
TPU logits parity p2-vs-p1, and writes probe_swin_pack.json next to
this file.  Run: python demo/image_classification/probe_swin_pack.py [batch]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))
import jax
import jax.numpy as jnp
import numpy as np

from tlxcv_tpu.core.module import pure, split
from tlxcv_tpu.models.classification.swin_transformer import (
    set_window_pack, swin_base)

V5E_BF16_PEAK = 197e12
SWIN_B_FLOPS = 30.8e9


def _bf16(d):
    return {k: (v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v)
            for k, v in d.items()}


def timeit(step, args, iters=10, reps=5):
    def once():
        out = step(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        return float(jnp.sum(leaf.astype(jnp.float32)))

    once()
    once()
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters - 1):
            out = step(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.sum(leaf.astype(jnp.float32)))
        times.append((time.perf_counter() - t0) / iters)
    times.sort()
    return times[len(times) // 2]


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    model = swin_base(num_classes=1000)
    params, state = split(model)
    params = _bf16(params)
    x = jnp.asarray(np.random.rand(batch, 224, 224, 3), jnp.bfloat16)

    print(f"Swin-B 224^2 b{batch} bf16 — packed-window A/B", flush=True)
    results = {}
    logits = {}
    for p in (1, 2, 4):
        set_window_pack(model, p)
        # fresh trace per pack: `pack` is a static python attr, an
        # existing jit cache entry would silently reuse the old layout
        fn = pure(model)
        step = jax.jit(lambda pp, ss, xx, f=fn: f(pp, ss, xx,
                                                  training=False)[0])
        flops = None
        try:
            comp = step.lower(params, state, x).compile()
            ca = comp.cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            flops = float(ca.get("flops", 0.0)) or None
        except Exception:
            pass
        dt = timeit(step, (params, state, x))
        img_s = batch / dt
        mfu = img_s * SWIN_B_FLOPS / V5E_BF16_PEAK * 100
        extra = (f"  graph {flops / 1e9:7.1f} GF ({flops / dt / 1e12:5.1f}"
                 " TF/s achieved)") if flops else ""
        print(f"  pack={p}: {dt * 1e3:8.2f} ms = {img_s:7.1f} img/s  "
              f"(model-FLOPs MFU {mfu:4.1f}%){extra}", flush=True)
        results[f"pack{p}"] = {
            "ms": round(dt * 1e3, 2), "img_s": round(img_s, 1),
            "mfu_pct": round(mfu, 1),
            "graph_gflops": round(flops / 1e9, 1) if flops else None}
        logits[p] = np.asarray(step(params, state, x)[:4].astype(jnp.float32))

    a, b = logits[1].ravel(), logits[2].ravel()
    cos = float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))
    results["cos_p2_vs_p1"] = round(cos, 6)
    print(f"  logits cos(p2, p1) = {cos:.6f}", flush=True)
    assert cos > 0.999, "packed attention diverged from baseline"

    base = results["pack1"]["img_s"]
    best = max((r["img_s"], k) for k, r in results.items()
               if isinstance(r, dict))
    results["speedup_best"] = round(best[0] / base, 3)
    results["best"] = best[1]
    print(f"  best: {best[1]} at {best[0]:.1f} img/s "
          f"({best[0] / base:.2f}x pack1)", flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "probe_swin_pack.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
