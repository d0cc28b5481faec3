"""Swin-B serving component split (BASELINE config #2, second half).

Same methodology as the HRNet/Mask R-CNN splits (BENCHMARKS.md):
cumulative jitted prefixes with fetch-true timing + XLA cost-analysis
FLOPs, so each stage's cost and achieved TFLOP/s are visible.  Also
A/Bs the attention-only vs MLP-only cost inside stage 3 (the 18-block
workhorse) by swapping each for identity, to locate the window-attention
overhead the BASELINE config names.

Run: python demo/image_classification/profile_swin.py [batch]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))
import jax
import jax.numpy as jnp
import numpy as np

from tlxcv_tpu.core.module import pure, split
from tlxcv_tpu.models.classification.swin_transformer import swin_base

V5E_BF16_PEAK = 197e12
SWIN_B_FLOPS = 30.8e9  # 2 x 15.4 GMAC @ 224^2


def _bf16(d):
    return {k: (v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v)
            for k, v in d.items()}


def timeit(step, args, iters=10, reps=5):
    def once():
        out = step(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        return float(jnp.sum(leaf.astype(jnp.float32)))

    once()
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


def _stage_fn(upto):
    def fn(model, x):
        x = model.patch_embed(x)
        b, h, w, c = x.shape
        x = model.patch_norm(x.reshape(b, h * w, c))
        if upto == "embed":
            return x
        for si, blocks in enumerate(model.stages):
            for blk in blocks:
                x = blk(x)
            if si < len(model.mergers):
                x = model.mergers[si](x)
            if upto == f"stage{si + 1}":
                return x
        return model.head(jnp.mean(model.norm(x), axis=1))

    return fn


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    model = swin_base(num_classes=1000)
    pack = int(os.environ.get("TLXCV_SWIN_PACK", "1"))
    if pack > 1:
        from tlxcv_tpu.models.classification.swin_transformer import (
            set_window_pack)
        set_window_pack(model, pack)
        print(f"(window pack = {pack})", flush=True)
    params, state = split(model)
    params = _bf16(params)
    x = jnp.asarray(np.random.rand(batch, 224, 224, 3), jnp.bfloat16)

    print(f"Swin-B 224^2 b{batch} bf16 component split", flush=True)
    prev = 0.0
    for stage in ["embed", "stage1", "stage2", "stage3", "stage4", "full"]:
        fn = pure(model, _stage_fn(stage))
        step = jax.jit(lambda p, s, xx, f=fn: f(p, s, xx, training=False)[0])
        flops = None
        try:
            comp = step.lower(params, state, x).compile()
            ca = comp.cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            flops = float(ca.get("flops", 0.0)) or None
        except Exception:
            pass
        dt = timeit(step, (params, state, x))
        extra = ""
        if flops:
            extra = (f"  {flops / 1e9:7.1f} GF  "
                     f"{flops / dt / 1e12:6.1f} TFLOP/s "
                     f"({flops / dt / V5E_BF16_PEAK * 100:4.1f}% peak)")
        print(f"  upto {stage:8s} {dt * 1e3:8.2f} ms  "
              f"(+{(dt - prev) * 1e3:7.2f} ms){extra}", flush=True)
        prev = dt

    full = prev
    print(f"  full model: {full * 1e3:.2f} ms = {batch / full:.1f} img/s "
          f"(model-FLOPs MFU {batch / full * SWIN_B_FLOPS / V5E_BF16_PEAK * 100:.1f}%)")

    # attention-vs-MLP split inside the blocks: time the full model with
    # (a) attention replaced by identity, (b) MLP replaced by identity.
    # The difference full - (a) ~= attention cost incl. window
    # partition/reverse + rolls; full - (b) ~= MLP cost.
    def no_attn(model, x):
        x = model.patch_embed(x)
        b, h, w, c = x.shape
        x = model.patch_norm(x.reshape(b, h * w, c))
        for si, blocks in enumerate(model.stages):
            for blk in blocks:
                x = x + blk.drop_path(blk.mlp(blk.norm2(x)))
            if si < len(model.mergers):
                x = model.mergers[si](x)
        return model.head(jnp.mean(model.norm(x), axis=1))

    def no_mlp(model, x):
        x = model.patch_embed(x)
        b, h, w, c0 = x.shape
        x = model.patch_norm(x.reshape(b, h * w, c0))
        for si, blocks in enumerate(model.stages):
            for blk in blocks:
                hh, ww = blk.input_hw
                b_, l, c = x.shape
                shortcut = x
                y = blk.norm1(x).reshape(b_, hh, ww, c)
                if blk.shift > 0:
                    y = jnp.roll(y, (-blk.shift, -blk.shift), axis=(1, 2))
                from tlxcv_tpu.models.classification.swin_transformer import (
                    window_partition, window_reverse)
                wins = window_partition(y, blk.ws)
                mask = (None if blk.attn_mask is None
                        else jnp.asarray(blk.attn_mask))
                aw = blk.attn(wins, mask)
                y = window_reverse(aw, blk.ws, hh, ww)
                if blk.shift > 0:
                    y = jnp.roll(y, (blk.shift, blk.shift), axis=(1, 2))
                x = shortcut + blk.drop_path(y.reshape(b_, l, c))
            if si < len(model.mergers):
                x = model.mergers[si](x)
        return model.head(jnp.mean(model.norm(x), axis=1))

    for name, fn in [("attention removed", no_attn), ("mlp removed", no_mlp)]:
        f = pure(model, fn)
        step = jax.jit(lambda p, s, xx, f=f: f(p, s, xx, training=False)[0])
        dt = timeit(step, (params, state, x))
        print(f"  {name:18s} {dt * 1e3:8.2f} ms  "
              f"(delta vs full {-(full - dt) * 1e3:+.2f} ms)", flush=True)

    # int8 Linears (weight + calibrated activation quant): the ViT
    # finding generalizes — Swin blocks are Linear-MAC-dominated, the
    # two window einsums are ~4% — so the int8 MXU win lives in the
    # Linears (profile_vit.py measured +14% on ViT-B).
    from tlxcv_tpu.ops.quant import calibrate_activations, quantize_weights

    nq = quantize_weights(model)
    calibrate_activations(model,
                          [np.random.rand(2, 224, 224, 3).astype(np.float32)])
    params, state = split(model)
    params = _bf16(params)
    f = pure(model)
    step = jax.jit(lambda p, s, xx: f(p, s, xx, training=False)[0])
    dt = timeit(step, (params, state, x))
    print(f"  int8 ({nq} layers)  {dt * 1e3:8.2f} ms = {batch / dt:.1f} img/s"
          f"  (bf16 was {batch / full:.1f})", flush=True)


if __name__ == "__main__":
    main()
