"""A/B the space-to-depth stem rewrite on the int8 ResNet-50 serving
graph (real TPU). The stages profile (profile_resnet_int8_stages.json)
pins the 7x7/2 stem at ~12.5 TFLOP/s int8 (3% of peak) — the worst op
in the graph; the rewrite trades +30% stem FLOPs (K 147->192) for an
unstrided, channel-dense MXU mapping. Chained in-graph timing per
CLAUDE.md (standalone dispatch floor ~0.86 ms on the axon relay)."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from tlxcv_tpu.core import pure, split
from tlxcv_tpu.models import resnet50
from tlxcv_tpu.ops.quant import quantize_for_serving
from tlxcv_tpu.ops.space_to_depth import convert_stem_to_space_to_depth

B = 256
CHAIN = 8
REPS = 5


def build(s2d):
    m = resnet50(num_classes=1000)
    if s2d:
        convert_stem_to_space_to_depth(m)
    calib = np.random.default_rng(1).normal(size=(4, 224, 224, 3))
    quantize_for_serving(m, [calib.astype(np.float32)])
    return m


def measure(m, x):
    params, state = split(m)
    fwd = pure(m)

    @jax.jit
    def f(p, s, v):
        acc = jnp.float32(0)
        for i in range(CHAIN):
            out, _ = fwd(p, s, v + jnp.bfloat16(i) * jnp.bfloat16(1e-3))
            acc = acc + out.astype(jnp.float32).sum()
        return acc

    run = lambda: float(f(params, state, x))
    run()
    ts = []
    for _ in range(REPS + 2):
        t0 = time.perf_counter()
        run()
        ts.append(time.perf_counter() - t0)
    per = sorted(ts[2:])[REPS // 2] / CHAIN
    return per * 1e3, B / per


def main():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(B, 224, 224, 3)),
                    jnp.bfloat16)
    out = {}
    for name, s2d in [("orig", False), ("s2d", True)]:
        ms, ips = measure(build(s2d), x)
        out[name] = {"ms_per_batch": round(ms, 2), "img_per_s": round(ips, 1)}
        print(f"{name:5s} {ms:7.2f} ms/b{B}  {ips:9.1f} img/s", flush=True)
    out["speedup"] = round(out["s2d"]["img_per_s"] / out["orig"]["img_per_s"], 4)
    print("speedup:", out["speedup"])
    with open(__file__.replace(".py", ".json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
