"""ResNet-50 int8 serving A/B: where does the non-MXU time go?

BENCH_r03: bf16 12,099 img/s (50.4% MFU) but int8 only 13,727 (28.6%
of int8 peak) — the int8 MXU offers 2x and the graph banks +13%.  The
suspects (VERDICT r3 next #1) are the per-edge glue: activation
quantize (div/round/clip/cast) on the consumer side, f32 dequant +
separate BN between every conv, and bf16 inter-layer buffers.

Variants (cumulative):
  bf16        — reference point (no quantization)
  int8        — r3 pipeline: quantize_weights + calibrate_activations
  int8_fold   — + fold_batchnorm (BN folded into w_scale/bias: the
                dequant-scale, BN scale/shift collapse to ONE per-channel
                multiply-add on the int32 accumulator)
  int8_fused  — + fuse_requantize (producer-side requant: inter-layer
                HBM buffers drop bf16 -> int8, consumer quantize chains
                vanish; ops/quant.py)

Each variant also sweeps batch {256, 512, 1024} (VERDICT suggested a
batch re-tune).  Timing: fetch-forced chained steps (bench.py
_throughput).

Run: python demo/image_classification/profile_resnet_int8.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))
import json

import jax
import jax.numpy as jnp
import numpy as np

from tlxcv_tpu.core import pure, split
from tlxcv_tpu.models import resnet50

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))
from bench import RESNET_FLOPS, V5E_BF16_PEAK, V5E_INT8_PEAK, _bf16, \
    _throughput


def build(variant):
    from tlxcv_tpu.ops.quant import (calibrate_activations, fold_batchnorm,
                                     fuse_requantize, quantize_weights)

    model = resnet50(num_classes=1000)
    calib = [np.random.default_rng(1).normal(
        size=(4, 224, 224, 3)).astype(np.float32)]
    if variant == "bf16":
        pass
    elif variant == "int8":
        quantize_weights(model)
        calibrate_activations(model, calib)
    elif variant == "int8_fold":
        n = fold_batchnorm(model, calib[0])
        quantize_weights(model)
        calibrate_activations(model, calib)
        print(f"  folded {n} BNs", flush=True)
    elif variant == "int8_fused":
        n = fold_batchnorm(model, calib[0])
        quantize_weights(model)
        calibrate_activations(model, calib)
        m = fuse_requantize(model, calib[0])
        print(f"  folded {n} BNs, fused {m} requant edges", flush=True)
    else:
        raise ValueError(variant)
    return model


def run(variant, batch):
    model = build(variant)
    params, state = split(model)
    fwd = pure(model)

    @jax.jit
    def infer(params, state, x):
        out, _ = fwd(params, state, x)
        return out.sum()

    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(batch, 224, 224, 3)), jnp.bfloat16)
    if variant == "bf16":
        params = _bf16(params)
    ips = _throughput(infer, (params, state, x), batch)
    peak = V5E_BF16_PEAK if variant == "bf16" else V5E_INT8_PEAK
    mfu = 100 * ips * RESNET_FLOPS / peak
    print(f"{variant:12s} b{batch:<5d} {ips:9.1f} img/s  "
          f"mfu {mfu:5.1f}%", flush=True)
    return ips, mfu


def main():
    results = {}
    for variant in ("bf16", "int8", "int8_fold", "int8_fused"):
        batches = (512,) if variant in ("bf16", "int8") else (256, 512, 1024)
        for b in batches:
            ips, mfu = run(variant, b)
            results[f"{variant}_b{b}"] = {"img_per_s": round(ips, 1),
                                          "mfu_pct": round(mfu, 1)}
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "profile_resnet_int8.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
