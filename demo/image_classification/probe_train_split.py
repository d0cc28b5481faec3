"""Train-step attribution probe (round 5 — where do the non-forward
2/3 of the ResNet-50 train step go?).

bench.py's resnet50_train leg reads 28.2% train-MFU (3x-fwd
convention) while the serving fwd runs at 50.5% MFU — i.e. the
backward+update section runs at ~2.4x the cost of two forwards
instead of 2x-at-forward-efficiency.  This probe jits cumulative
prefixes of the exact bench step (the profile_swin.py methodology) to
attribute the gap:

  fwd        forward only, training=True (batch-stat BN), loss
  fwd_eval   forward only, training=False (running-stat BN)
  grad       fwd + bwd (value_and_grad; grads reduced to one scalar
             on device so the whole tree materializes)
  grad_eval  fwd + bwd with training=False (BN-stats cost in the
             bwd pass = grad - grad_eval, modulo the stats fwd delta)
  grad_bf16  fwd + bwd with params ALREADY bf16 (no per-step master
             cast; bounds the cast + f32-grad-accumulate cost)
  step       the full bench leg (fwd + bwd + adam + apply)

Timings are fetch-true (float() on a scalar output — the axon relay's
block_until_ready returns early, CLAUDE.md).  Each leg's per-step ms
and implied img/s are written to probe_train_split.json.

Run: timeout 2400 python demo/image_classification/probe_train_split.py
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
from tlxcv_tpu.models import resnet18, resnet50

V5E_BF16_PEAK = 197e12
RESNET_FLOPS = 8.2e9
BATCH = int(os.environ.get("PROBE_BATCH", "256"))  # tiny for CPU smoke
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "probe_train_split.json")
RESULTS = {}


def _time(name, fn, *args):
    # warmup (compile) + fetch-true timing
    for _ in range(2):
        out = fn(*args)
    float(out)
    rates = []
    iters = 8
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        float(out)
        rates.append((time.perf_counter() - t0) / iters)
    rates.sort()
    ms = rates[len(rates) // 2] * 1e3
    ips = BATCH / (ms * 1e-3)
    print(f"  {name:10s} {ms:8.2f} ms/step  {ips:8.1f} img/s", flush=True)
    RESULTS[name] = {"ms": round(ms, 2), "img_s": round(ips, 1)}
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=1)
    return ms


def main():
    from tlxcv_tpu.core.init import set_seed

    set_seed(0)
    build = resnet18 if os.environ.get("PROBE_MODEL") == "resnet18" \
        else resnet50  # resnet18 = CPU smoke only
    model = build(num_classes=1000)
    params, state = split(model)
    fwd = pure(model)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(BATCH, 224, 224, 3)), jnp.bfloat16)
    y = jnp.asarray(rng.integers(0, 1000, size=(BATCH,)), jnp.int32)

    def loss_of(p, training):
        pb = jax.tree.map(
            lambda v: v.astype(jnp.bfloat16)
            if v.dtype == jnp.float32 else v, p)
        logits, ns = fwd(pb, state, x, training=training)
        ce = optax.softmax_cross_entropy_with_integer_labels(
            logits.astype(jnp.float32), y)
        return ce.mean(), ns

    @jax.jit
    def leg_fwd(p):
        return loss_of(p, True)[0]

    @jax.jit
    def leg_fwd_eval(p):
        return loss_of(p, False)[0]

    def gsum(g):
        return sum(jnp.sum(jnp.abs(v).astype(jnp.float32))
                   for v in jax.tree.leaves(g))

    @jax.jit
    def leg_grad(p):
        (loss, _), g = jax.value_and_grad(
            lambda q: loss_of(q, True), has_aux=True)(p)
        return loss + gsum(g)

    @jax.jit
    def leg_grad_eval(p):
        (loss, _), g = jax.value_and_grad(
            lambda q: loss_of(q, False), has_aux=True)(p)
        return loss + gsum(g)

    params_bf16 = jax.tree.map(
        lambda v: v.astype(jnp.bfloat16)
        if v.dtype == jnp.float32 else v, params)

    @jax.jit
    def leg_grad_bf16(p):
        def lf(q):
            logits, ns = fwd(q, state, x, training=True)
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits.astype(jnp.float32), y)
            return ce.mean(), ns
        (loss, _), g = jax.value_and_grad(lf, has_aux=True)(p)
        return loss + gsum(g)

    @jax.jit
    def leg_step(p, o):
        (loss, ns), g = jax.value_and_grad(
            lambda q: loss_of(q, True), has_aux=True)(p)
        u, o2 = tx.update(g, o)
        p2 = optax.apply_updates(p, u)
        # reduce everything to one scalar so nothing is fetched but
        # nothing can be dead-code-eliminated; XLA on this toolchain
        # simplifies mult-by-zero (CLAUDE.md), so use a tiny epsilon
        psum = sum(jnp.sum(jnp.abs(v).astype(jnp.float32))
                   for v in jax.tree.leaves(p2))
        return loss + 1e-30 * psum

    t_fwd = _time("fwd", leg_fwd, params)
    _time("fwd_eval", leg_fwd_eval, params)
    t_grad = _time("grad", leg_grad, params)
    _time("grad_eval", leg_grad_eval, params)
    _time("grad_bf16", leg_grad_bf16, params_bf16)
    t_step = _time("step", leg_step, params, opt_state)

    RESULTS["attribution"] = {
        "bwd_ms": round(t_grad - t_fwd, 2),
        "bwd_over_fwd": round((t_grad - t_fwd) / t_fwd, 2),
        "opt_ms": round(t_step - t_grad, 2),
        "train_mfu_pct": round(
            100 * (BATCH / (t_step * 1e-3)) * 3 * RESNET_FLOPS
            / V5E_BF16_PEAK, 1),
    }
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=1)
    print(json.dumps(RESULTS))


if __name__ == "__main__":
    main()
