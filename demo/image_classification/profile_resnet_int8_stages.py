"""ResNet-50 int8 cumulative-prefix split — the component-level leg of
the r4 roofline verdict (BENCHMARKS.md "ResNet-50 int8 roofline").

probe_int8_mxu.py measured the per-OP int8 ceilings (dot 111 / conv3x3
164 / shaped-1x1 ~30 TFLOP/s); this script shows WHERE the e2e int8
graph's time goes, Mask-R-CNN-analysis style: cumulative jitted
prefixes (stem / +layer1 / ... / +head) on the full fold+fuse serving
pipeline, each with its FLOP count, so every stage's achieved TFLOP/s
can be read against the probe ceilings.

Run: python demo/image_classification/profile_resnet_int8_stages.py
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

from tlxcv_tpu.core import pure, split
from tlxcv_tpu.models import resnet50
from tlxcv_tpu.ops.quant import quantize_for_serving

B = 256
REPS = 5
V5E_INT8_PEAK = 394e12


def _time(fn, *args):
    out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))  # compile + fetch
    ts = []
    for _ in range(REPS + 2):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(out.astype(jnp.float32)))  # fetch-true sync
        ts.append(time.perf_counter() - t0)
    return sorted(ts[2:])[REPS // 2]


def _flops(fn, *args):
    try:
        c = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(c, (list, tuple)):
            c = c[0]
        return float(c.get("flops", 0.0))
    except Exception:
        return float("nan")


def main():
    model = resnet50(num_classes=1000)
    calib = [np.random.default_rng(1).normal(
        size=(4, 224, 224, 3)).astype(np.float32)]
    info = quantize_for_serving(model, calib)
    print(f"serving pipeline: folded/quantized/calibrated/fused = {info}")
    params, state = split(model)

    def prefix(upto):
        def f(m, x):
            x = m.stem(x)
            for i, name in enumerate(
                    ("layer1", "layer2", "layer3", "layer4"), 1):
                if upto < i:
                    return x
                x = getattr(m, name)(x)
            if upto >= 5:
                x = jnp.mean(x, axis=(1, 2))
                x = m.fc(x)
            return x
        return f

    x = jnp.asarray(np.random.default_rng(0).normal(size=(B, 224, 224, 3)),
                    jnp.bfloat16)
    rows = []
    prev_ms = 0.0
    prev_gf = 0.0
    names = ["stem", "+layer1", "+layer2", "+layer3", "+layer4",
             "+gap/fc (full)"]
    for upto, label in enumerate(names):
        fwd = pure(model, prefix(upto))
        jit = jax.jit(lambda p, s, v: fwd(p, s, v, training=False)[0])
        t = _time(jit, params, state, x)
        gf = _flops(lambda p, s, v: fwd(p, s, v, training=False)[0],
                    params, state, x) / 1e9
        dms = t * 1e3 - prev_ms
        dgf = gf - prev_gf
        tf = dgf / max(dms, 1e-9) / 1e3  # TFLOP/s for the stage delta
        rows.append({"stage": label, "cum_ms": round(t * 1e3, 2),
                     "delta_ms": round(dms, 2), "cum_gf": round(gf, 1),
                     "delta_gf": round(dgf, 1),
                     "stage_tflops": round(tf, 1),
                     "stage_pct_int8_peak": round(100 * tf * 1e12 /
                                                  V5E_INT8_PEAK, 1)})
        print(f"  {label:16s} {t*1e3:8.2f} ms (+{dms:6.2f})  "
              f"{gf:8.1f} GF (+{dgf:6.1f})  {tf:7.1f} TFLOP/s "
              f"({rows[-1]['stage_pct_int8_peak']:.1f}% int8 peak)",
              flush=True)
        prev_ms, prev_gf = t * 1e3, gf

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "profile_resnet_int8_stages.json")
    with open(out, "w") as f:
        json.dump(rows, f, indent=1)
    full_ms = rows[-1]["cum_ms"]
    print(f"full: {full_ms:.2f} ms = {B / full_ms * 1e3:.0f} img/s")


if __name__ == "__main__":
    main()
