"""Benchmark harness — prints ONE JSON line for the driver.

North-star metrics (BASELINE.json): ResNet-50 AND YOLOv3 inference
images/sec/chip on the real TPU, each >=2x an H100 chip.  The reference
publishes no absolute perf numbers (BASELINE.md), so the H100 side is a
nominal framework-level bf16 figure: 4500 img/s for ResNet-50 @224, and
600 img/s for YOLOv3 @416 (ResNet-50 figure scaled by the FLOPs ratio
8.2 vs 62 GFLOPs/img — same hardware-efficiency assumption).  Targets
are 2x those; each metric reports its own vs_baseline = ours / target.
Revise when a measured reference baseline lands.

The headline value/vs_baseline stay ResNet-50 (stable driver parse);
the other benchmarks ride in the same JSON object as <name>_* keys.

Survivability (VERDICT r4 weak #1: BENCH_r04.json was rc=124 /
parsed:null — the driver's timeout killed the process before the single
end-of-run print):

- The full JSON line is RE-EMITTED after every completed leg (last line
  wins at the driver's parser), so a kill at any point still leaves all
  finished numbers on stdout.
- SIGTERM/SIGINT are trapped: the current line is printed before dying.
- A total wall-clock budget (env BENCH_BUDGET_S, default 2700 s —
  under the observed driver timeout) gates each leg on a conservative
  per-leg cost estimate; legs that don't fit are skipped and named in
  the `skipped_legs` field rather than silently lost.
- Legs run headline-first: resnet bf16 -> yolov3 -> int8s -> train ->
  the rest.
"""
import json
import os
import signal
import sys
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np

RESNET_TARGET = 2 * 4500.0
YOLO_TARGET = 2 * 600.0

# FLOPs per image for MFU accounting (2 x MACs at the bench resolutions).
# ResNet/YOLO/ViT use the standard published model FLOPs (comparable
# across frameworks); Mask R-CNN / HRNet have no canonical figure, so
# they use XLA's compiled.cost_analysis() on the exact bench graph —
# recomputed LIVE at bench time when the runtime exposes it (ADVICE r4:
# the old hardcoded constants silently went stale if the graphs
# changed), with the last measured values as fallback.
RESNET_FLOPS = 8.2e9       # ResNet-50 @ 224^2
YOLO_FLOPS = 65.9e9        # YOLOv3 @ 416^2 (backbone+FPN+head)
VIT_FLOPS = 35.1e9         # ViT-B/16 @ 224^2 (2 x 17.56 GMAC)
MASK_RCNN_FLOPS = 259.7e9  # fallback: cost_analysis, r4 graph @ 640^2
HRNET_FLOPS = 46.1e9       # fallback: cost_analysis, r4 graph @ 512^2
V5E_BF16_PEAK = 197e12     # TPU v5e per-chip bf16 peak FLOP/s
V5E_INT8_PEAK = 394e12

T_START = time.monotonic()
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "2700"))

# Assembled driver line: every completed leg merges its fields here and
# the whole line is re-printed (incremental emission — last line wins).
RESULTS = {}
SKIPPED = []
# The watchdog thread emits concurrently with the main thread's
# RESULTS writes; an unsynchronized dict iteration there can raise
# mid-emit and lose the wedge error line entirely.
_RESULTS_LOCK = threading.Lock()


def _assemble():
    line = {
        "metric": "resnet50_infer_images_per_sec_per_chip",
        "value": 0.0,
        "unit": "img/s",
        "vs_baseline": 0.0,
    }
    with _RESULTS_LOCK:
        line.update(RESULTS)
    if SKIPPED:
        line["skipped_legs"] = ",".join(SKIPPED)
    return line


def emit(**extra):
    line = _assemble()
    line.update(extra)
    print(json.dumps(line), flush=True)


def _note(msg):
    print(f"[bench {int(time.monotonic() - T_START)}s] {msg}",
          file=sys.stderr, flush=True)


def _bf16(params):
    return {k: (v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v)
            for k, v in params.items()}


def _alive():
    """Heartbeat for the wedge watchdog: called whenever a dispatch
    completes, so slow-but-progressing runs (cold compiles) are never
    mistaken for a wedged relay."""
    global _LAST_PROGRESS
    _LAST_PROGRESS = time.monotonic()


_LAST_PROGRESS = time.monotonic()


def _cpu_prep():
    """Context: run quantization prep (BN fold / calibration / fuse
    verification) on the host CPU backend.  Prep compiles the FLOAT
    model several times; doing that on the relay costs 30-90 s per
    compile and contributes nothing to the measured serving number —
    only the final int8 graph belongs on the TPU.  CPU f32 also makes
    the fold/fuse verification exact (no bf16-rounding false positives,
    cf. commit 65826fb)."""
    return jax.default_device(jax.devices("cpu")[0])


def _pin(tree):
    """Move a pytree of (possibly CPU-committed) arrays onto the default
    accelerator ONCE, before timing.  Prep under _cpu_prep leaves the
    quantized weights host-committed; without this every timed dispatch
    re-ships them through the relay — invisible on an idle host (the
    change was validated at full speed), but a 20-30x collapse when the
    host CPU is contended (observed: resnet int8 14,613 -> 432 img/s
    with a full pytest suite running)."""
    dev = jax.devices()[0]
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, dev), tree)


def _compile(fn, args):
    """AOT-compile `fn` and return (callable, flops_per_call | None).

    cost_analysis gives the compiled graph's flops — used to keep the
    Mask R-CNN / HRNet MFU constants honest (ADVICE r4).  Falls back to
    plain jit when the backend doesn't support AOT/cost queries."""
    try:
        compiled = jax.jit(fn).lower(*args).compile()
    except Exception:
        return jax.jit(fn), None
    flops = None
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        f = float(ca.get("flops", 0.0))
        if f > 0:
            flops = f
    except Exception:
        pass
    return compiled, flops


def _throughput(step, args, batch, n_iters=20, warmup=3, reps=5):
    """Fetch-forced timing: on the axon relay block_until_ready()
    returns before the device finishes, so a host fetch is the honest
    pipeline drain (utils/profiler.benchmark_fn).

    VERDICT r2 weak #5 (14% run-to-run wobble): `warmup` extra
    fetch-timed calls after compile let clocks/caches settle, then the
    reported number is the MEDIAN of `reps` independent rounds of
    `n_iters` chained steps."""
    float(step(*args))  # compile (no-op first call when AOT-compiled)
    _alive()
    for _ in range(warmup):
        float(step(*args))
        _alive()
    rates = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n_iters):
            out = step(*args)
        float(out)
        _alive()
        rates.append(batch * n_iters / (time.perf_counter() - t0))
    rates.sort()
    return rates[len(rates) // 2]


def bench_resnet50():
    from tlxcv_tpu.core import pure, split
    from tlxcv_tpu.models import resnet50

    model = resnet50(num_classes=1000)
    params, state = split(model)
    fwd = pure(model)

    def infer(params, state, x):
        out, _ = fwd(params, state, x)
        return out.sum()

    batch = 512
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(batch, 224, 224, 3)),
        jnp.bfloat16)
    args = (_bf16(params), state, x)
    step, _ = _compile(infer, args)
    ips = _throughput(step, args, batch)
    return {
        "value": round(ips, 2),
        "vs_baseline": round(ips / RESNET_TARGET, 4),
        "resnet50_tflops": round(ips * RESNET_FLOPS / 1e12, 1),
        "resnet50_mfu_pct": round(100 * ips * RESNET_FLOPS / V5E_BF16_PEAK, 1),
    }


def bench_yolov3():
    """Full predict path in one jit: backbone + FPN + head + on-device
    anchor decode + class-aware NMS (BASELINE config #3)."""
    from tlxcv_tpu.core import pure, split
    from tlxcv_tpu.models.detection import YOLOv3

    model = YOLOv3(num_classes=80, use_matrix_nms=True)
    params, state = split(model)
    fwd = pure(model)

    def infer(params, state, x):
        (dets, counts), _ = fwd(params, state, x, training=False)
        return dets.sum() + counts.sum()

    batch = 128  # batch-scaling probe: b64 left ~30% idle (BENCHMARKS.md)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(batch, 416, 416, 3)),
        jnp.bfloat16)
    args = (_bf16(params), state, x)
    step, _ = _compile(infer, args)
    ips = _throughput(step, args, batch, n_iters=10)
    return {
        "yolov3_metric": "yolov3_416_e2e_infer_images_per_sec_per_chip",
        "yolov3_value": round(ips, 2),
        "yolov3_unit": "img/s",
        "yolov3_vs_baseline": round(ips / YOLO_TARGET, 4),
        "yolov3_tflops": round(ips * YOLO_FLOPS / 1e12, 1),
        "yolov3_mfu_pct": round(100 * ips * YOLO_FLOPS / V5E_BF16_PEAK, 1),
    }


def bench_resnet50_int8():
    """Post-training full-int8 serving path: quantize + BN fold +
    producer-side requantization (ops/quant.quantize_for_serving), b256
    (the measured optimum — profile_resnet_int8.json)."""
    from tlxcv_tpu.core import pure, split
    from tlxcv_tpu.models import resnet50
    from tlxcv_tpu.ops.quant import quantize_for_serving

    model = resnet50(num_classes=1000)
    calib = np.random.default_rng(1).normal(size=(4, 224, 224, 3))
    with _cpu_prep():
        quantize_for_serving(model, [calib.astype(np.float32)])
    params, state = _pin(split(model))
    fwd = pure(model)

    def infer(params, state, x):
        out, _ = fwd(params, state, x)
        return out.sum()

    batch = 256
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(batch, 224, 224, 3)),
        jnp.bfloat16)
    args = (params, state, x)
    step, _ = _compile(infer, args)
    ips = _throughput(step, args, batch)
    return {
        "resnet50_int8_value": round(ips, 2),
        "resnet50_int8_vs_baseline": round(ips / RESNET_TARGET, 4),
        "resnet50_int8_mfu_pct": round(
            100 * ips * RESNET_FLOPS / V5E_INT8_PEAK, 1),
    }


def bench_yolov3_int8():
    from tlxcv_tpu.core import pure, split
    from tlxcv_tpu.models.detection import YOLOv3
    from tlxcv_tpu.ops.quant import calibrate_activations, quantize_weights

    model = YOLOv3(num_classes=80, use_matrix_nms=True)
    calib = np.random.default_rng(1).normal(size=(2, 416, 416, 3))
    with _cpu_prep():
        quantize_weights(model)
        calibrate_activations(model, [calib.astype(np.float32)],
                              forward=lambda v: model.head_outputs(v))
    params, state = _pin(split(model))
    fwd = pure(model)

    def infer(params, state, x):
        (dets, counts), _ = fwd(params, state, x, training=False)
        return dets.sum() + counts.sum()

    batch = 128
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(batch, 416, 416, 3)),
        jnp.bfloat16)
    args = (params, state, x)
    step, _ = _compile(infer, args)
    ips = _throughput(step, args, batch, n_iters=10)
    return {
        "yolov3_int8_value": round(ips, 2),
        "yolov3_int8_vs_baseline": round(ips / YOLO_TARGET, 4),
    }


def bench_resnet50_train():
    """Training-step throughput: fwd + bwd + Adam in ONE jit, bf16
    compute / f32 master weights (VERDICT r4 #6 — the reference's core
    loop is training; a train-path regression must be driver-visible).
    Same step as demo/image_classification/bench_train.py; MFU uses the
    standard 3x-forward-FLOPs convention for fwd+bwd."""
    import optax

    from tlxcv_tpu.core import pure, split
    from tlxcv_tpu.models import resnet50

    model = resnet50(num_classes=1000)
    params, state = split(model)
    fwd = pure(model)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    rng = np.random.default_rng(0)
    batch = 256
    x = jnp.asarray(rng.normal(size=(batch, 224, 224, 3)), jnp.bfloat16)
    y = jnp.asarray(rng.integers(0, 1000, size=(batch,)), jnp.int32)

    @jax.jit
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

    # state-threading loop (params update each step, so the plain
    # repeated-args _throughput harness doesn't apply)
    p, s, o = params, state, opt_state
    for _ in range(3):
        p, s, o, loss = train_step(p, s, o, x, y)
    float(loss)
    _alive()
    rates = []
    iters = 10
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(iters):
            p, s, o, loss = train_step(p, s, o, x, y)
        float(loss)  # fetch-true sync
        _alive()
        rates.append(batch * iters / (time.perf_counter() - t0))
    rates.sort()
    ips = rates[len(rates) // 2]
    return {
        "resnet50_train_value": round(ips, 2),
        "resnet50_train_unit": "img/s",
        "resnet50_train_mfu_pct": round(
            100 * ips * 3 * RESNET_FLOPS / V5E_BF16_PEAK, 1),
    }


def bench_mask_rcnn():
    """Full instance path (RPN -> packed-corner RoIAlign -> box head ->
    NMS -> mask head) in one jit (BASELINE config #5)."""
    from tlxcv_tpu.core import pure, split
    from tlxcv_tpu.models.detection.mask_rcnn import MaskRCNN

    model = MaskRCNN(num_classes=80)
    params, state = split(model)
    fwd = pure(model)

    def infer(params, state, x):
        out, _ = fwd(params, state, x, training=False)
        return sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(out))

    batch = 16  # +8% over the historical b8 config (BENCHMARKS.md)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(batch, 640, 640, 3)),
        jnp.bfloat16)
    args = (_bf16(params), state, x)
    step, live_flops = _compile(infer, args)
    ips = _throughput(step, args, batch, n_iters=10)
    flops = (live_flops / batch) if live_flops else MASK_RCNN_FLOPS
    return {
        "mask_rcnn_640_value": round(ips, 2),
        "mask_rcnn_640_unit": "img/s",
        "mask_rcnn_640_mfu_pct": round(
            100 * ips * flops / V5E_BF16_PEAK, 1),
        "mask_rcnn_640_flops_src": "live" if live_flops else "const",
    }


def bench_vit():
    """ViT-B/16 serving, bf16, XLA attention (BASELINE config #2).

    b64 measured faster than b256 (2,981 vs 2,602 img/s) and XLA
    attention beats the Pallas flash kernel at the FULL-model level
    (the isolated-op 1.38x win does not survive composition — the
    64->128 lane padding doubles attention FLOPs and XLA fuses the
    projections around its own softmax; BENCHMARKS.md r3,
    demo/image_classification/profile_vit.py for the A/B)."""
    from tlxcv_tpu.core import pure, split
    from tlxcv_tpu.models.classification.vision_transformer import (
        vit_base_patch16_224)

    model = vit_base_patch16_224()
    params, state = split(model)
    fwd = pure(model)

    def infer(params, state, x):
        out, _ = fwd(params, state, x, training=False)
        return out.sum()

    batch = 64
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(batch, 224, 224, 3)),
        jnp.bfloat16)
    args = (_bf16(params), state, x)
    step, _ = _compile(infer, args)
    ips = _throughput(step, args, batch)
    return {
        "vit_b16_value": round(ips, 2),
        "vit_b16_mfu_pct": round(100 * ips * VIT_FLOPS / V5E_BF16_PEAK, 1),
    }


def bench_vit_int8():
    """ViT-B/16 int8-Linear serving (BASELINE #2 follow-through): the 50
    qkv/proj/MLP Linears carry 96% of the MACs; attention einsums stay
    bf16 + XLA (int8 attention measured SLOWER — BENCHMARKS.md r4)."""
    from tlxcv_tpu.core import pure, split
    from tlxcv_tpu.models.classification.vision_transformer import (
        vit_base_patch16_224)
    from tlxcv_tpu.ops.quant import calibrate_activations, quantize_weights

    model = vit_base_patch16_224()
    calib = np.random.default_rng(1).normal(size=(4, 224, 224, 3))
    with _cpu_prep():
        quantize_weights(model)
        calibrate_activations(model, [calib.astype(np.float32)])
    params, state = _pin(split(model))
    fwd = pure(model)

    def infer(params, state, x):
        out, _ = fwd(params, state, x, training=False)
        return out.sum()

    batch = 256
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(batch, 224, 224, 3)),
        jnp.bfloat16)
    args = (params, state, x)
    step, _ = _compile(infer, args)
    ips = _throughput(step, args, batch)
    return {
        "vit_b16_int8_value": round(ips, 2),
        # int8 legs compute mfu against the int8 peak, same basis as
        # resnet50_int8 (mixing bases made ViT-int8 look 2x more
        # efficient than ResNet-int8 when they are near-identical)
        "vit_b16_int8_mfu_pct": round(
            100 * ips * VIT_FLOPS / V5E_INT8_PEAK, 1),
    }


def bench_hrnet_seg():
    """HRNet-W18 FCN segmentation 512^2 (BASELINE config #4: full
    multi-resolution fusion + bilinear upsample in one jit)."""
    from tlxcv_tpu.core import pure, split
    from tlxcv_tpu.models.segmentation.hrnet_seg import hrnet_seg_w18

    from tlxcv_tpu.models.backbones.hrnet import (
        convert_hrnet_branches_to_s2d)

    model = hrnet_seg_w18(num_classes=19)
    # eval-exact serving transform: narrow branches run space-to-depth
    # blocked (probe_hrnet_s2d.json: e2e 1.49x).  NB the blocked graph's
    # cost_analysis FLOPs are inflated by structural kernel zeros, so
    # MFU must use the ORIGINAL model's useful FLOPs (const fallback).
    convert_hrnet_branches_to_s2d(model)
    params, state = split(model)
    fwd = pure(model)

    def infer(params, state, x):
        out, _ = fwd(params, state, x, training=False)
        return out.sum()

    batch = 16
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(batch, 512, 512, 3)),
        jnp.bfloat16)
    args = (_bf16(params), state, x)
    step, _ = _compile(infer, args)
    ips = _throughput(step, args, batch, n_iters=10)
    return {
        "hrnet_w18_seg_512_value": round(ips, 2),
        "hrnet_w18_seg_512_mfu_pct": round(
            100 * ips * HRNET_FLOPS / V5E_BF16_PEAK, 1),
        "hrnet_w18_seg_512_flops_src": "const_s2d",
    }


# (name, fn, conservative wall-clock estimate incl. cold compile).
# Ordered headline-first (VERDICT r4 #1); the train leg sits after the
# four headline serving legs (VERDICT #6: it must exist in the artifact)
# and before the secondary models.
LEGS = [
    ("resnet50", bench_resnet50, 150),
    ("yolov3", bench_yolov3, 420),
    ("resnet50_int8", bench_resnet50_int8, 330),
    ("yolov3_int8", bench_yolov3_int8, 420),
    ("resnet50_train", bench_resnet50_train, 240),
    ("vit_b16", bench_vit, 150),
    ("vit_b16_int8", bench_vit_int8, 270),
    ("mask_rcnn", bench_mask_rcnn, 420),
    ("hrnet_seg", bench_hrnet_seg, 240),
]

WATCHDOG_S = 1500  # max silence between COMPLETED dispatches; the
# longest healthy gap is one cold compile (~250s for detection NMS
# paths), so 25 min with zero dispatches finishing means a wedged relay


def main():
    # Relay watchdog: a wedged axon relay blocks a dispatch FOREVER
    # inside the client retry loop (r3: 15h outage observed).  This is a
    # LIVENESS probe, not the total-time budget: every completed
    # dispatch resets the clock (_alive), so a healthy-but-slow
    # cold-cache run proceeds leg-by-leg under the BUDGET_S gate, while
    # a true wedge is detected within WATCHDOG_S.  On wedge, emit the
    # assembled line (with every finished leg) + error, exit 2.
    done = threading.Event()

    def watchdog():
        while not done.wait(30):
            quiet = time.monotonic() - _LAST_PROGRESS
            if quiet > WATCHDOG_S:
                emit(error=("TPU unreachable/wedged: no dispatch "
                            f"completed for {int(quiet)}s"))
                os._exit(2)

    threading.Thread(target=watchdog, daemon=True).start()

    def on_term(signum, frame):
        emit(note=f"terminated by signal {signum} mid-run")
        os._exit(0)

    # Save/restore the previous handlers: in-process callers (the bench
    # harness tests run main() under pytest) must not inherit an
    # os._exit(0) SIGTERM handler for the rest of their process.
    prev_term = signal.signal(signal.SIGTERM, on_term)
    prev_int = signal.signal(signal.SIGINT, on_term)
    try:
        for name, fn, est in LEGS:
            elapsed = time.monotonic() - T_START
            if elapsed + est > BUDGET_S:
                SKIPPED.append(name)
                _note(f"skipping {name}: {int(elapsed)}s elapsed + ~{est}s "
                      f"> budget {int(BUDGET_S)}s")
                continue
            _note(f"leg {name} starting ({int(elapsed)}s elapsed)")
            t_leg = time.monotonic()
            try:
                leg = fn()
                with _RESULTS_LOCK:
                    RESULTS.update(leg)
                    # per-leg wall-clock (mostly cold compile): diagnoses
                    # a future rc-124 from the artifact itself
                    RESULTS[f"{name}_leg_s"] = round(
                        time.monotonic() - t_leg, 1)
            except Exception as e:  # broken leg must not kill the artifact
                SKIPPED.append(name)
                with _RESULTS_LOCK:
                    RESULTS[f"{name}_error"] = f"{type(e).__name__}: {e}"[:200]
                _note(f"leg {name} FAILED: {e}")
            emit()
        done.set()
        emit()  # final line (identical to the last incremental one)
    finally:
        done.set()
        signal.signal(signal.SIGTERM, prev_term)
        signal.signal(signal.SIGINT, prev_int)


if __name__ == "__main__":
    main()
