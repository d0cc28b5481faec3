"""Stem-only probe: where did the s2d rewrite's win go?

Times JUST the stem stage (conv+bn+relu+maxpool prefix, int8-served) at
b256, chained in-graph, for: (a) original 7x7/2; (b) s2d with the
blocking transform on-device; (c) s2d with PRE-BLOCKED input (the
MLPerf deployment: the input pipeline emits the 2x2-blocked layout —
normalize commutes with s2d so this is free on the host side).
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

from tlxcv_tpu.core import pure, split
from tlxcv_tpu.models import resnet50
from tlxcv_tpu.ops.quant import quantize_for_serving
from tlxcv_tpu.ops.space_to_depth import convert_stem_to_space_to_depth

B = 256
CHAIN = 16
REPS = 5


def timed(fwd, params, state, x):
    @jax.jit
    def f(p, s, v):
        acc = jnp.float32(0)
        for i in range(CHAIN):
            out = fwd(p, s, v + jnp.bfloat16(i) * jnp.bfloat16(1e-3),
                      training=False)[0]
            acc = acc + out.astype(jnp.float32).sum()
        return acc
    run = lambda: float(f(params, state, x))
    run()
    ts = []
    for _ in range(REPS + 2):
        t0 = time.perf_counter()
        run()
        ts.append(time.perf_counter() - t0)
    return sorted(ts[2:])[REPS // 2] / CHAIN * 1e3


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, 224, 224, 3)), jnp.bfloat16)
    out = {}

    def stem_fwd(m, v, training=False):
        return m.stem(v)

    # (a) original
    m = resnet50(num_classes=1000)
    quantize_for_serving(m, [np.asarray(rng.normal(size=(4, 224, 224, 3)),
                                        np.float32)])
    p, s = split(m)
    out["orig"] = timed(pure(m, stem_fwd), p, s, x)
    print(f"orig stem        {out['orig']:6.2f} ms", flush=True)

    # (b) s2d, transform on device
    m2 = resnet50(num_classes=1000)
    convert_stem_to_space_to_depth(m2)
    quantize_for_serving(m2, [np.asarray(rng.normal(size=(4, 224, 224, 3)),
                                         np.float32)])
    p2, s2 = split(m2)
    out["s2d_device"] = timed(pure(m2, stem_fwd), p2, s2, x)
    print(f"s2d on-device    {out['s2d_device']:6.2f} ms", flush=True)

    # (c) s2d, pre-blocked input: run only the inner 4x4 conv + bn/relu
    # + maxpool on an already-blocked [B,115,115,12] tensor (the exact
    # tensor (b)'s transform produces for 224 inputs)
    xb = np.asarray(jnp.pad(x, ((0, 0), (4, 2), (4, 2), (0, 0)))
                    .reshape(B, 115, 2, 115, 2, 3)
                    .transpose(0, 1, 3, 2, 4, 5).reshape(B, 115, 115, 12))
    xb = jnp.asarray(xb, jnp.bfloat16)

    from tlxcv_tpu import nn as tnn

    def blocked_fwd(m, v, training=False):
        # bn1 is folded (identity) post-serving-pipeline
        return m.maxpool(tnn.relu(m.bn1(m.conv1.conv(v))))

    out["s2d_preblocked"] = timed(pure(m2, blocked_fwd), p2, s2, xb)
    print(f"s2d pre-blocked  {out['s2d_preblocked']:6.2f} ms", flush=True)

    with open(__file__.replace(".py", ".json"), "w") as f:
        json.dump({k: round(v, 3) for k, v in out.items()}, f, indent=1)


if __name__ == "__main__":
    main()
