"""Benchmark harness — prints ONE JSON line for the driver.

Flagship metric: ResNet-50 inference images/sec/chip on the real TPU
(BASELINE.json north star: >=2x H100 img/s/chip).  The reference
publishes no absolute perf numbers (BASELINE.md), so `vs_baseline` is
measured against a nominal H100 bf16 framework-level ResNet-50 inference
throughput of 4500 img/s => target 2x = 9000; vs_baseline =
ours / 9000.  Revise when a measured reference baseline lands.
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

H100_NOMINAL = 4500.0
TARGET = 2 * H100_NOMINAL


def main():
    from tlxcv_tpu.core import pure, split
    from tlxcv_tpu.models import resnet50

    model = resnet50(num_classes=1000)
    params, state = split(model)
    # bf16 inference path: weights + activations in bf16, BN stays f32
    params = {k: (v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v)
              for k, v in params.items()}
    fwd = pure(model)

    @jax.jit
    def infer(params, state, x):
        out, _ = fwd(params, state, x)
        # reduce to a scalar so completion can be forced with one host
        # fetch — on the axon relay block_until_ready() returns before
        # the device finishes, so fetch-based timing is the honest one
        return out.sum()

    batch = 512
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(batch, 224, 224, 3)),
        jnp.bfloat16)

    # warmup / compile
    float(infer(params, state, x))

    n_iters = 20
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = infer(params, state, x)
    float(out)  # host fetch == pipeline drain
    dt = time.perf_counter() - t0
    ips = batch * n_iters / dt

    print(json.dumps({
        "metric": "resnet50_infer_images_per_sec_per_chip",
        "value": round(ips, 2),
        "unit": "img/s",
        "vs_baseline": round(ips / TARGET, 4),
    }))


if __name__ == "__main__":
    main()
