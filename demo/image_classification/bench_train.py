"""Training-step throughput (fwd + bwd + Adam update, one jit).

BENCHMARKS.md has the serving story; this measures the training side
for the two flagship families on one chip. MFU uses the standard 3x
forward-FLOPs convention for fwd+bwd.

Run: python demo/image_classification/bench_train.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))
import jax
import jax.numpy as jnp
import numpy as np
import optax

from tlxcv_tpu.core.module import pure, split

V5E_BF16_PEAK = 197e12
CONFIGS = [
    # (name, builder, batch, per-image fwd FLOPs)
    ("resnet50", lambda: _resnet50(), 256, 8.2e9),
    ("vit_b16", lambda: _vit(), 128, 35.1e9),
]


def _resnet50():
    from tlxcv_tpu.models.classification.resnet import ResNet

    return ResNet(depth=50, num_classes=1000)


def _vit():
    from tlxcv_tpu.models.classification.vision_transformer import (
        vit_base_patch16_224)

    return vit_base_patch16_224()


def bench(name, build, batch, fwd_flops):
    model = build()
    params, state = split(model)
    fwd = pure(model)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch, 224, 224, 3)), jnp.bfloat16)
    y = jnp.asarray(rng.integers(0, 1000, size=(batch,)), jnp.int32)

    @jax.jit
    def step(params, state, opt_state, x, y):
        def loss_fn(p):
            # mixed precision: f32 master weights, bf16 compute (the
            # cast is inside the differentiated fn so grads come back
            # through it and the optimizer update stays f32)
            pb = jax.tree.map(
                lambda v: v.astype(jnp.bfloat16)
                if v.dtype == jnp.float32 else v, p)
            logits, ns = fwd(pb, state, x, training=True)
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits.astype(jnp.float32), y)
            return ce.mean(), ns

        (loss, state), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        u, opt_state = tx.update(g, opt_state)
        return optax.apply_updates(params, u), state, opt_state, loss

    # warmup/compile
    p, s, o = params, state, opt_state
    for _ in range(3):
        p, s, o, loss = step(p, s, o, x, y)
    float(loss)
    reps = []
    iters = 10
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(iters - 1):
            p, s, o, loss = step(p, s, o, x, y)
        p, s, o, loss = step(p, s, o, x, y)
        float(loss)  # fetch-true sync
        reps.append((time.perf_counter() - t0) / iters)
    reps.sort()
    dt = reps[len(reps) // 2]
    ips = batch / dt
    mfu = ips * 3 * fwd_flops / V5E_BF16_PEAK * 100
    print(f"  {name:10s} b{batch:<4d} {dt * 1e3:8.2f} ms/step  "
          f"{ips:8.1f} img/s  train-MFU {mfu:4.1f}%", flush=True)


def main():
    print("training step (fwd+bwd+adam, one jit, bf16 activations):",
          flush=True)
    for name, build, batch, flops in CONFIGS:
        bench(name, build, batch, flops)


if __name__ == "__main__":
    main()
