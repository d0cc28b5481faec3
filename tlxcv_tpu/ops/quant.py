"""Post-training int8 quantization for serving (round-2 backlog item).

Two tiers:

- :func:`quantize_weights` — weight-only: every Conv2d/Linear kernel
  becomes int8 with a per-output-channel symmetric scale; activations
  stay bf16/f32 and the kernel is dequantized on the fly (halves weight
  HBM traffic, numerically tight).
- :func:`calibrate_activations` + ``full_int8=True`` — static
  activation quantization: an eager calibration pass records per-layer
  input abs-max over sample batches, after which convs/matmuls run
  int8 x int8 -> int32 on the MXU (2x bf16 peak on v5e).

The int8 execution lives inside ``nn.Conv2d.__call__`` /
``nn.Linear.__call__`` (they dispatch on ``weight.dtype == int8``), so
quantized models run through the same ``pure()``/Trainer plumbing —
``split()`` after quantization picks up the int8 weights and scale
params automatically.

Transformers: the two attention einsums (q.kT and p.v) are activations
x activations, so weight quantization can't reach them — enable
``nn.use_int8_attention(True)`` to run them as dynamic int8 (per-head
q/k/v scales, per-row probability scales, no calibration needed).
"""
from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
import numpy as np

from .. import nn
from ..core.module import Param

__all__ = ["quantize_weights", "calibrate_activations", "dequantize_check",
           "fold_batchnorm", "fuse_requantize", "quantize_for_serving",
           "enable_qat", "disable_qat", "qat_serving_convert"]


def _quantizable(mod) -> bool:
    return isinstance(mod, (nn.Conv2d, nn.Linear)) and \
        mod.weight.value.dtype in (jnp.float32, jnp.bfloat16)


def quantize_weights(model, include: tp.Optional[tp.Callable] = None):
    """In-place: convert Conv2d/Linear kernels to int8 + per-out-channel
    scale.  ``include(path, mod) -> bool`` filters layers (default all).
    Returns the number of layers quantized.

    Quantizes the module's CURRENT weights.  After functional training
    (``pure``/``split``), the module still holds its init weights —
    ``model.load_state_dict({**params, **state})`` first, or you will
    silently serve a quantized UNTRAINED model."""
    count = 0
    for path, mod in model.modules():
        if not _quantizable(mod):
            continue
        if include is not None and not include(path, mod):
            continue
        w = np.asarray(mod.weight.value, np.float32)
        axis = tuple(range(w.ndim - 1))  # HWIO / (in, out): out is last
        s = np.max(np.abs(w), axis=axis) / 127.0
        s = np.maximum(s, 1e-12)
        q = np.clip(np.round(w / s), -127, 127).astype(np.int8)
        mod.weight.value = jnp.asarray(q)
        mod.w_scale = Param(jnp.asarray(s, jnp.float32))
        count += 1
    return count


def calibrate_activations(model, batches, percentile: float = 100.0,
                          forward=None):
    """Eager calibration pass: run ``model(x)`` on host batches, record
    each quantized layer's input abs-max, and attach ``a_scale`` params
    so subsequent calls take the full-int8 path.

    Call AFTER :func:`quantize_weights`.  ``batches`` is an iterable of
    input arrays.  Keep them small — this runs op-by-op (eager).
    ``forward`` overrides the calibration callable (e.g. a detector's
    ``head_outputs`` to skip the eager NMS postprocess).

    QAT: float layers flagged by :func:`enable_qat` are calibrated too
    (their ``a_scale`` feeds the activation fake-quant in training and
    carries over verbatim to the serving graph —
    :func:`qat_serving_convert`)."""
    layers = [mod for _, mod in model.modules()
              if isinstance(mod, (nn.Conv2d, nn.Linear))
              and (mod.weight.value.dtype == jnp.int8
                   or getattr(mod, "_qat", False))]
    records = {id(mod): [] for mod in layers}

    orig_conv = nn.Conv2d.__call__
    orig_lin = nn.Linear.__call__

    def rec_conv(self, x):
        if id(self) in records:
            records[id(self)].append(float(jnp.max(jnp.abs(x))))
            # calibration forward runs the weight-only path
            a = getattr(self, "a_scale", None)
            if a is not None:
                del self.a_scale
            out = orig_conv(self, x)
            if a is not None:
                self.a_scale = a
            return out
        return orig_conv(self, x)

    def rec_lin(self, x):
        if id(self) in records:
            records[id(self)].append(float(jnp.max(jnp.abs(x))))
            a = getattr(self, "a_scale", None)
            if a is not None:
                del self.a_scale
            out = orig_lin(self, x)
            if a is not None:
                self.a_scale = a
            return out
        return orig_lin(self, x)

    nn.Conv2d.__call__ = rec_conv
    nn.Linear.__call__ = rec_lin
    try:
        call = forward if forward is not None else model
        for x in batches:
            call(jnp.asarray(x))
    finally:
        nn.Conv2d.__call__ = orig_conv
        nn.Linear.__call__ = orig_lin

    for mod in layers:
        vals = records[id(mod)]
        if not vals:
            continue
        amax = float(np.percentile(vals, percentile))
        mod.a_scale = Param(jnp.asarray(max(amax, 1e-12) / 127.0,
                                        jnp.float32))
    return len(layers)


def enable_qat(model, act: bool = True,
               include: tp.Optional[tp.Callable] = None) -> int:
    """Turn on quantization-aware training: every float Conv2d/Linear
    fake-quantizes its weight (per-out-channel int8, straight-through
    estimator) on the forward pass, bit-aligned with
    :func:`quantize_weights`'s scale/clip, so the loss sees exactly the
    weights the int8 serving path will load.

    ``act=True`` additionally fake-quantizes each layer's input with
    the static calibrated scale once :func:`calibrate_activations` has
    attached ``a_scale`` (run it right after this, on a few batches) —
    mirroring the full-int8 serving path.  Workflow::

        enable_qat(model)                    # flags + weight fake-quant
        calibrate_activations(model, cal)    # attach a_scale (QAT-aware)
        ... fine-tune via pure()/split()/Trainer ...
        model.load_state_dict({**params, **state})
        qat_serving_convert(model)           # int8 serving, bit-aligned

    ``include(path, mod) -> bool`` filters layers (default all).
    Returns the number of layers flagged.  Already-int8 layers are
    skipped (they are serving artifacts, not trainable)."""
    count = 0
    for path, mod in model.modules():
        if not isinstance(mod, (nn.Conv2d, nn.Linear)) or \
                mod.weight.value.dtype == jnp.int8:
            continue
        if include is not None and not include(path, mod):
            continue
        mod._qat = True
        mod._qat_act = act
        count += 1
    return count


def disable_qat(model, keep_scales: bool = True) -> int:
    """Clear QAT flags in place (calibrated ``a_scale`` params are kept
    by default so :func:`qat_serving_convert` can reuse them)."""
    count = 0
    for _, mod in model.modules():
        if getattr(mod, "_qat", False):
            count += 1
        for attr in ("_qat", "_qat_act"):
            if hasattr(mod, attr):
                delattr(mod, attr)
        if not keep_scales and hasattr(mod, "a_scale"):
            del mod.a_scale
    return count


def qat_serving_convert(model,
                        include: tp.Optional[tp.Callable] = None) -> int:
    """Convert a QAT-fine-tuned model in place to the int8 serving path,
    BIT-ALIGNED with its QAT forward: weights quantize with the same
    per-out-channel scale formula the fake-quant used (so the served
    int8 codes are exactly the ones training optimized against), and
    the calibrated ``a_scale`` params carry over verbatim (no
    re-calibration — re-measuring scales post-QAT would break the
    alignment the fine-tune established).

    By default only the layers that were QAT-flagged convert — an
    ``enable_qat(include=...)`` exclusion (e.g. keeping a sensitive
    head float) carries through to serving; layers training never saw
    fake-quantized stay float.  Pass ``include`` explicitly to override
    (same ``(path, mod) -> bool`` contract as
    :func:`quantize_weights`); if no layer carries a QAT flag (plain
    PTQ model), all float layers convert as before.

    Remember the functional-training trap: after ``pure()``/``split()``
    training the module still holds its INIT weights —
    ``model.load_state_dict({**params, **state})`` first.

    Returns the number of layers quantized."""
    if include is None:
        flagged = {id(m) for _, m in model.modules()
                   if getattr(m, "_qat", False)}
        if flagged:
            include = lambda path, mod: id(mod) in flagged
    disable_qat(model, keep_scales=True)
    return quantize_weights(model, include=include)


def _trace(model, example, forward=None):
    """One eager forward recording an ordered op-event list.

    Each event is ``{"kind", "mod", "in", "out", "ref"}`` where ``in``/
    ``out`` are tensor ``id()``s.  Every traced output tensor is pinned
    in ``ref`` so CPython cannot recycle its id mid-trace (id reuse
    after garbage collection would fabricate adjacency).  Raw jnp ops
    (``+``, slicing, …) are invisible to the trace by design — callers
    must treat an unmatched id as "unknown consumer" and leave the
    producer alone; :func:`fold_batchnorm` / :func:`fuse_requantize`
    additionally verify numerics on the example input.
    """
    events = []
    patched = []

    def wrap(cls):
        orig = cls.__call__

        def wrapped(self, *a, **k):
            out = orig(self, *a, **k)
            ins = tuple(t for t in a if hasattr(t, "shape"))
            # pin BOTH inputs and output: a recorded id whose tensor is
            # freed mid-trace can be recycled by CPython, fabricating
            # adjacency between unrelated ops
            events.append({"kind": cls.__name__, "mod": self,
                           "in": tuple(id(t) for t in ins), "out": id(out),
                           "ref": (ins, out)})
            return out

        cls.__call__ = wrapped
        patched.append((cls, orig))

    wrap(nn.Conv2d)
    wrap(nn.Linear)
    wrap(nn.BatchNorm)
    wrap(nn.MaxPool2d)

    import tlxcv_tpu.nn as _nn
    import tlxcv_tpu.nn.layers as _layers
    orig_relu = _layers.relu

    def traced_relu(t):
        out = orig_relu(t)
        events.append({"kind": "relu", "mod": None, "in": (id(t),),
                       "out": id(out), "ref": (t, out)})
        return out

    _nn.relu = _layers.relu = traced_relu
    try:
        (forward or model)(jnp.asarray(example))
    finally:
        for cls, orig in patched:
            cls.__call__ = orig
        _nn.relu = _layers.relu = orig_relu
    return events


def _int8_conv(mod) -> bool:
    return isinstance(mod, nn.Conv2d) and mod.weight.value.dtype == jnp.int8


def fold_batchnorm(model, example, forward=None, tol=1e-2):
    """Fold every eval-mode BatchNorm into its producing Conv2d.

    The BN affine ``(x - mean) * gamma / sqrt(var + eps) + beta``
    becomes a per-output-channel weight scale + bias on the conv
    (reference serving graphs bake this at export; here it also lets
    the int8 path requantize straight out of the conv — see
    :func:`fuse_requantize`).  Works on float and int8-quantized convs:
    float kernels are rescaled in place, int8 kernels fold the BN scale
    into ``w_scale`` (exact — no requantization error).

    Folding uses RUNNING stats: the folded model is a serving artifact;
    calling a folded BN under ``training=True`` raises.

    Verifies the model output on ``example`` is unchanged (<= ``tol``
    relative); a raw-op consumer invisible to the trace would break
    equivalence and trips this check.  Returns the number folded.

    Verification runs under ``jax.default_matmul_precision("highest")``:
    on TPU, f32 convs default to bf16 operands, so rescaling a trained
    kernel changes its bf16 rounding by ~2^-9 relative per layer — a
    random walk that compounds to ~1% over a 72-conv net (the trained
    YOLOv3 sweep checkpoint measured 1.1%, tripping tol=1e-2 as a false
    positive, r5).  A genuinely untraced consumer produces O(1) errors
    and still trips at any precision.
    """
    with jax.default_matmul_precision("highest"):
        y0 = np.asarray((forward or model)(jnp.asarray(example)), np.float32)
    events = _trace(model, example, forward)
    produced = {}
    consumers = {}
    for ev in events:
        produced[ev["out"]] = ev
        for i in ev["in"]:
            consumers[i] = consumers.get(i, 0) + 1

    count = 0
    undo = []  # restore closures so a failed verification can't leave a
    # half-folded model behind (fuse_requantize already rolls back)
    for ev in events:
        if ev["kind"] != "BatchNorm" or getattr(ev["mod"], "_folded", False):
            continue
        bn = ev["mod"]
        src = produced.get(ev["in"][0])
        if src is None or src["kind"] != "Conv2d":
            continue
        if consumers.get(ev["in"][0], 0) != 1:
            continue  # conv output has other (traced) consumers
        conv = src["mod"]
        if conv.weight.value.shape[-1] != bn.running_mean.value.shape[0]:
            continue  # BN not over the conv's output channels
        scale = np.asarray(bn.running_var.value, np.float32)
        scale = 1.0 / np.sqrt(scale + bn.eps)
        shift = -np.asarray(bn.running_mean.value, np.float32) * scale
        if bn.weight is not None:
            g = np.asarray(bn.weight.value, np.float32)
            scale = scale * g
            shift = shift * g
        if bn.bias is not None:
            shift = shift + np.asarray(bn.bias.value, np.float32)
        old_bias = conv.bias
        if _int8_conv(conv):
            old_ws = conv.w_scale.value

            def _restore(c=conv, ws=old_ws, ob=old_bias, b_=bn):
                c.w_scale.value = ws
                c.bias = ob
                b_._folded = False
            conv.w_scale.value = conv.w_scale.value * jnp.asarray(scale)
        else:
            old_w = conv.weight.value

            def _restore(c=conv, w_=old_w, ob=old_bias, b_=bn):
                c.weight.value = w_
                c.bias = ob
                b_._folded = False
            w = conv.weight.value
            conv.weight.value = (w.astype(jnp.float32) *
                                 jnp.asarray(scale)).astype(w.dtype)
        undo.append(_restore)
        b = shift if conv.bias is None else \
            np.asarray(conv.bias.value, np.float32) * scale + shift
        conv.bias = Param(jnp.asarray(b, jnp.float32))
        bn._folded = True
        count += 1

    with jax.default_matmul_precision("highest"):
        y1 = np.asarray((forward or model)(jnp.asarray(example)), np.float32)
    err = float(np.max(np.abs(y1 - y0)))
    ref = float(np.max(np.abs(y0))) + 1e-12
    if err > tol * ref:
        for f in reversed(undo):
            f()
        raise ValueError(
            f"fold_batchnorm changed the model output (max abs diff {err:g}"
            f" vs max |y| {ref:g}) — an untraced consumer reads a folded"
            " conv/BN tensor (model restored; fold selectively or fix the"
            " trace)")
    return count


def fuse_requantize(model, example, forward=None, tol=0.05):
    """Producer-side int8 requantization for calibrated graphs.

    After :func:`quantize_weights` + :func:`fold_batchnorm` +
    :func:`calibrate_activations`, every conv whose (traced) consumer
    chain passes only through folded BatchNorms / ReLU / MaxPool2d and
    ends at exactly one calibrated int8 conv gets ``out_scale`` (the
    consumer's input scale) and emits int8 DIRECTLY: the int32
    accumulator is scaled, biased, ReLU'd and requantized inside the
    conv's own XLA output fusion.  The consumer skips its activation
    quantize.  Net effect vs the consumer-side path: the inter-layer
    HBM buffer drops bf16 -> int8 and one divide/round/clip/cast chain
    per edge disappears — the glue that held ResNet-50 int8 at 28.6%
    MFU (BENCH_r03).

    ReLU before the quantize is absorbed exactly (monotone); MaxPool
    commutes with the monotone quantizer so pooling may sit between
    producer and consumer.

    Raw jnp ops (residual ``+``, concat, slicing) are invisible to the
    trace, so a chain that LOOKS linear can hide a second consumer —
    e.g. the ResNet stem maxpool output feeds both layer1's conv AND
    layer1's residual add; fusing it would hand raw int8 codes to the
    add.  Safety is therefore NUMERICAL, not structural: fuse all
    candidate edges, verify the end-to-end output moved <= ``tol``
    relative, and on failure re-add edges one at a time keeping only
    those that preserve the output (greedy rollback — O(edges x
    examples) eager forwards, offline-export cost only).  Returns the
    number of fused edges that survive.

    ``example`` may be a LIST of inputs: verification (including the
    greedy rollback) must then hold on every one (ADVICE r4: a hidden
    second consumer whose effect stayed under tol on a single batch
    silently survived fusion; :func:`quantize_for_serving` now passes
    all calibration batches).
    """
    examples = [jnp.asarray(e) for e in
                (example if isinstance(example, (list, tuple))
                 else [example])]
    _run = forward or model

    def run(x):
        # highest matmul precision: the residual FLOAT convs otherwise
        # run bf16-operand on TPU and their rounding noise eats into the
        # int8 tol budget (see fold_batchnorm's verification note)
        with jax.default_matmul_precision("highest"):
            return _run(x)

    y0s = [np.asarray(run(x), np.float32) for x in examples]
    events = _trace(model, examples[0], forward)
    consumers = {}
    for ev in events:
        if ev["out"] in ev["in"]:
            continue  # identity pass-through (folded BN returns its
            # input object) — transparent, not a real consumer
        for i in ev["in"]:
            consumers.setdefault(i, []).append(ev)

    edges = []  # (producer module, relu_seen, consumer a_scale)
    for ev in events:
        if ev["kind"] != "Conv2d" or not _int8_conv(ev["mod"]) or \
                getattr(ev["mod"], "a_scale", None) is None or \
                getattr(ev["mod"], "out_scale", None) is not None:
            continue
        cur, relu_seen = ev["out"], False
        target = None
        for _ in range(8):  # bounded chain walk
            nxt = consumers.get(cur, [])
            if len(nxt) != 1:
                break
            c = nxt[0]
            if c["kind"] == "relu":
                relu_seen, cur = True, c["out"]
            elif c["kind"] == "BatchNorm" and getattr(c["mod"], "_folded",
                                                      False):
                cur = c["out"]
            elif c["kind"] == "MaxPool2d":
                cur = c["out"]
            elif c["kind"] == "Conv2d" and _int8_conv(c["mod"]) and \
                    getattr(c["mod"], "a_scale", None) is not None:
                target = c["mod"]
                break
            else:
                break
        if target is not None:
            edges.append((ev["mod"], relu_seen, target.a_scale.value))

    refs = [float(np.max(np.abs(y0))) + 1e-12 for y0 in y0s]

    def fuse(mod, relu_seen, scale):
        mod.out_scale = Param(jnp.asarray(scale, jnp.float32))
        mod.relu_fused = relu_seen

    def unfuse(mod):
        del mod.out_scale
        if hasattr(mod, "relu_fused"):
            del mod.relu_fused

    def ok():
        for x, y0, ref in zip(examples, y0s, refs):
            y1 = np.asarray(run(x), np.float32)
            if float(np.max(np.abs(y1 - y0))) > tol * ref:
                return False
        return True

    for mod, relu_seen, scale in edges:
        fuse(mod, relu_seen, scale)
    if edges and not ok():
        # some edge's tensor has an untraced second consumer — greedy
        # re-add with per-edge verification
        for mod, _, _ in edges:
            unfuse(mod)
        kept = []
        for mod, relu_seen, scale in edges:
            fuse(mod, relu_seen, scale)
            if ok():
                kept.append(mod)
            else:
                unfuse(mod)
        edges = [e for e in edges if e[0] in kept]
        if edges and not ok():  # combined effect must also hold
            for mod, _, _ in edges:
                unfuse(mod)
            raise ValueError(
                "fuse_requantize: per-edge-verified set fails combined "
                "verification — rounding interactions exceed tol; raise "
                "tol or fuse manually")
    return len(edges)


def quantize_for_serving(model, calib_batches, forward=None,
                         percentile: float = 100.0):
    """One-call full-int8 serving pipeline: fold BN -> int8 weights ->
    activation calibration -> producer-side requantize fusion.

    ``calib_batches``: iterable of host input arrays (the first is the
    fold verification example; fuse verifies against all).  Returns
    ``(n_folded, n_quantized, n_calibrated, n_fused)``.
    """
    batches = list(calib_batches)
    example = batches[0]
    n_fold = fold_batchnorm(model, example, forward)
    n_q = quantize_weights(model)
    n_cal = calibrate_activations(model, batches, percentile, forward)
    # fuse verification must hold on EVERY calibration batch (ADVICE r4)
    n_fuse = fuse_requantize(model, batches, forward)
    return n_fold, n_q, n_cal, n_fuse


def dequantize_check(model) -> dict:
    """Report per-layer max |w - dequant(q)| (sanity harness)."""
    out = {}
    for path, mod in model.modules():
        if isinstance(mod, (nn.Conv2d, nn.Linear)) and \
                mod.weight.value.dtype == jnp.int8:
            s = np.asarray(mod.w_scale.value)
            out[path] = float(np.max(np.abs(s)) * 0.5)  # half-step bound
    return out
