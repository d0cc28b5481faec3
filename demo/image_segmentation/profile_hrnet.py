"""HRNet-W18 FCN segmentation component split (BASELINE config #4).

VERDICT r2 weak #4: 284 img/s at 512^2 b16 was reported with no
component split and no roofline claim.  This script reuses the
Mask R-CNN methodology (BENCHMARKS.md): cumulative prefix functions of
the forward pass, each jitted separately, chained-in-jit timing with a
forced host fetch (the axon relay returns from block_until_ready
early), successive differences = per-component cost.  XLA cannot fuse
across our cut points any differently than inside the full model for
conv-bound stages, so the split is honest to first order; the full
model is also timed directly as the ground truth.

Reference hot path: tlxcv/models/segmentation/backbones/hrnet.py:354-418
(FuseLayers multi-resolution exchange).

Run: python demo/image_segmentation/profile_hrnet.py [batch] [size]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 3)[0])

from tlxcv_tpu.core.module import pure, split
from tlxcv_tpu.models.segmentation.hrnet_seg import hrnet_seg_w18
from tlxcv_tpu.ops.image import interpolate

V5E_BF16_PEAK = 197e12


def _bf16(d):
    return {k: (v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v)
            for k, v in d.items()}


def _stage_fn(stage):
    """Forward prefix up to (and including) `stage`."""

    def fn(model, x):
        bb = model.backbone
        x = bb.conv2(bb.conv1(x))
        for b in bb.layer1:
            x = b(x)
        if stage == "stem+layer1":
            return x
        xs = bb.st2(bb.tr1([x]))
        if stage == "st2":
            return tuple(xs)
        xs = bb.st3(bb.tr2(xs))
        if stage == "st3":
            return tuple(xs)
        xs = bb.st4(bb.tr3(xs))
        if stage == "st4":
            return tuple(xs)
        size = xs[0].shape[1:3]
        ups = [xs[0]] + [interpolate(b, size=size, mode="bilinear")
                         for b in xs[1:]]
        feat = jnp.concatenate(ups, axis=-1)
        if stage == "concat_up":
            return feat
        logits = model.head(feat)
        if stage == "head":
            return logits
        return interpolate(logits, size=x0_size, mode="bilinear")

    return fn


STAGES = ["stem+layer1", "st2", "st3", "st4", "concat_up", "head", "full"]


def timeit(step, args, iters=10, reps=5):
    def once():
        out = step(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        return float(jnp.sum(leaf.astype(jnp.float32)))

    once()  # compile
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
    global x0_size
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    x0_size = (size, size)

    model = hrnet_seg_w18(num_classes=19)
    params, state = split(model)
    params = _bf16(params)
    x = jnp.asarray(np.random.rand(batch, size, size, 3), jnp.bfloat16)

    print(f"HRNet-W18 FCN {size}^2 b{batch} bf16 component split", flush=True)
    prev = 0.0
    rows = []
    for stage in STAGES:
        fn = pure(model, _stage_fn(stage))
        step = jax.jit(lambda p, s, xx, f=fn: f(p, s, xx)[0])
        # report compile-side FLOPs for the roofline claim when available
        flops = None
        try:
            comp = step.lower(params, state, x).compile()
            ca = comp.cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            flops = float(ca.get("flops", 0.0)) or None
        except Exception:
            pass
        dt = timeit(step, (params, state, x))
        rows.append((stage, dt, dt - prev, flops))
        extra = ""
        if flops:
            extra = (f"  {flops / 1e9:7.1f} GF  "
                     f"{flops / dt / 1e12:6.1f} TFLOP/s "
                     f"({flops / dt / V5E_BF16_PEAK * 100:4.1f}% peak)")
        print(f"  upto {stage:12s} {dt * 1e3:8.2f} ms  "
              f"(+{(dt - prev) * 1e3:7.2f} ms){extra}", flush=True)
        prev = dt

    full = rows[-1][1]
    print(f"\n  full model: {full * 1e3:.2f} ms = {batch / full:.1f} img/s")

    # A/B the upsample routing: integer->matmul (current default) vs
    # the forced two-axis-gather formulation, full model end to end.
    import tlxcv_tpu.models.backbones.hrnet as hr_mod
    import tlxcv_tpu.models.segmentation.hrnet_seg as seg_mod
    from tlxcv_tpu.ops import image as image_ops

    def gather_interp(*a, **kw):
        kw["fast_path"] = False
        return image_ops.interpolate(*a, **kw)

    fwd = pure(model)
    step = jax.jit(lambda p, s, xx: fwd(p, s, xx, training=False)[0])
    dt = timeit(step, (params, state, x))
    print(f"  full (matmul upsample routing): {dt * 1e3:.2f} ms "
          f"= {batch / dt:.1f} img/s")
    hr_mod.interpolate = gather_interp
    seg_mod.interpolate = gather_interp
    try:
        step2 = jax.jit(lambda p, s, xx: fwd(p, s, xx, training=False)[0])
        dt2 = timeit(step2, (params, state, x))
        print(f"  full (forced gather upsamples): {dt2 * 1e3:.2f} ms "
              f"= {batch / dt2:.1f} img/s")
    finally:
        hr_mod.interpolate = image_ops.interpolate
        seg_mod.interpolate = image_ops.interpolate


if __name__ == "__main__":
    main()
