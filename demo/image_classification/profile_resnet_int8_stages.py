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
CHAIN = 8  # applications chained inside ONE jit (CLAUDE.md in-graph rule)
V5E_INT8_PEAK = 394e12


def _chained(fwd, params, state, x):
    """K applications in one jit on perturbed inputs (defeats CSE) so the
    measured time is device time: one dispatch+fetch per measurement —
    sync-per-rep timing let host load leak into the prefix deltas (an
    early run under a busy CPU produced negative stage deltas)."""
    @jax.jit
    def f(p, s, v):
        acc = jnp.float32(0)
        for i in range(CHAIN):
            out = fwd(p, s, v + jnp.bfloat16(i) * jnp.bfloat16(1e-3),
                      training=False)[0]
            acc = acc + out.astype(jnp.float32).sum()
        return acc
    return lambda: float(f(params, state, x))


def _time(run):
    """Median per-application ms over REPS fetch-forced rounds."""
    run()  # compile + fetch
    ts = []
    for _ in range(REPS + 2):
        t0 = time.perf_counter()
        run()
        ts.append(time.perf_counter() - t0)
    return sorted(ts[2:])[REPS // 2] / CHAIN


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
        t = _time(_chained(fwd, params, state, x))
        gf = _flops(lambda p, s, v: fwd(p, s, v, training=False)[0],
                    params, state, x) / 1e9
        dms = t * 1e3 - prev_ms
        dgf = gf - prev_gf
        if dms > 0.1:  # below that the delta is dispatch noise (the
            # gap/fc stage adds ~1 GF and can even time negative)
            tf = dgf / dms  # GF/ms == TFLOP/s for the stage delta
            pct = round(100 * tf * 1e12 / V5E_INT8_PEAK, 1)
            tf_txt = f"{tf:7.1f} TFLOP/s ({pct:.1f}% int8 peak)"
            tf = round(tf, 1)
        else:
            tf = pct = None
            tf_txt = "   (delta below timing noise)"
        rows.append({"stage": label, "cum_ms": round(t * 1e3, 2),
                     "delta_ms": round(dms, 2), "cum_gf": round(gf, 1),
                     "delta_gf": round(dgf, 1),
                     "stage_tflops": tf,
                     "stage_pct_int8_peak": pct})
        print(f"  {label:16s} {t*1e3:8.2f} ms (+{dms:6.2f})  "
              f"{gf:8.1f} GF (+{dgf:6.1f})  {tf_txt}", flush=True)
        prev_ms, prev_gf = t * 1e3, gf

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "profile_resnet_int8_stages.json")
    with open(out, "w") as f:
        json.dump(rows, f, indent=1)
    # cum_ms still includes 1/CHAIN of the relay dispatch+fetch RTT;
    # the prefix DELTAS cancel it.  bench.py's fully-pipelined
    # resnet50_int8 line is the serving-throughput headline.
    full_ms = rows[-1]["cum_ms"]
    print(f"full (chained, ~RTT/{CHAIN} included): {full_ms:.2f} ms = "
          f"{B / full_ms * 1e3:.0f} img/s; serving headline is the "
          f"bench.py resnet50_int8 line")


if __name__ == "__main__":
    main()
