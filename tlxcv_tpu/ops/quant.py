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

import jax.numpy as jnp
import numpy as np

from .. import nn
from ..core.module import Param

__all__ = ["quantize_weights", "calibrate_activations", "dequantize_check"]


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
    ``head_outputs`` to skip the eager NMS postprocess)."""
    layers = [mod for _, mod in model.modules()
              if isinstance(mod, (nn.Conv2d, nn.Linear))
              and mod.weight.value.dtype == jnp.int8]
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


def dequantize_check(model) -> dict:
    """Report per-layer max |w - dequant(q)| (sanity harness)."""
    out = {}
    for path, mod in model.modules():
        if isinstance(mod, (nn.Conv2d, nn.Linear)) and \
                mod.weight.value.dtype == jnp.int8:
            s = np.asarray(mod.w_scale.value)
            out[path] = float(np.max(np.abs(s)) * 0.5)  # half-step bound
    return out
