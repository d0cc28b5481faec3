"""Train-step batch-size sweep (round 5 — the new bench train leg reads
28.2% train-MFU at b256 vs 50.5% serving MFU; is the gap batch
starvation or inherent bwd-pass cost?).

Sweeps the exact bench.py resnet50_train step over batch sizes, plus a
donate-opt-state variant (params/EMA cannot be donated — they alias
module arrays at step 1, CLAUDE.md — but the optimizer state can).

Run: timeout 1800 python demo/image_classification/probe_train_batch.py
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
import optax

from tlxcv_tpu.core import pure, split
from tlxcv_tpu.models import resnet50

V5E_BF16_PEAK = 197e12
RESNET_FLOPS = 8.2e9
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "probe_train_batch.json")
RESULTS = {}


def bench(batch, donate):
    from tlxcv_tpu.core.init import set_seed

    set_seed(0)
    model = resnet50(num_classes=1000)
    params, state = split(model)
    fwd = pure(model)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch, 224, 224, 3)), jnp.bfloat16)
    y = jnp.asarray(rng.integers(0, 1000, size=(batch,)), jnp.int32)

    def train_step(params, state, opt_state, x, y):
        def loss_fn(p):
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

    step = jax.jit(train_step,
                   donate_argnums=(2,) if donate else ())
    p, s, o = params, state, opt_state
    for _ in range(3):
        p, s, o, loss = step(p, s, o, x, y)
    float(loss)
    rates = []
    iters = 10
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(iters):
            p, s, o, loss = step(p, s, o, x, y)
        float(loss)
        rates.append(batch * iters / (time.perf_counter() - t0))
    rates.sort()
    ips = rates[len(rates) // 2]
    mfu = 100 * ips * 3 * RESNET_FLOPS / V5E_BF16_PEAK
    tag = f"b{batch}" + ("_donate" if donate else "")
    print(f"  {tag:14s} {ips:8.1f} img/s  train-MFU {mfu:4.1f}%",
          flush=True)
    RESULTS[tag] = {"img_s": round(ips, 1), "mfu_pct": round(mfu, 1)}
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=1)


def main():
    for batch, donate in ((256, False), (512, False), (1024, False),
                          (512, True)):
        try:
            bench(batch, donate=donate)
        except Exception as e:
            tag = f"b{batch}" + ("_donate" if donate else "")
            RESULTS[tag] = f"ERROR: {type(e).__name__}: {e}"[:160]
            with open(OUT, "w") as f:
                json.dump(RESULTS, f, indent=1)
    print(json.dumps(RESULTS))


if __name__ == "__main__":
    main()
