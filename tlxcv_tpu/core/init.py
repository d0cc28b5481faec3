"""Host-side weight initializers.

Construction-time init runs once on host in numpy (deterministic via
``set_seed``), then lives on device as jnp arrays.  This replaces the
per-backend initializer dispatch in TensorLayerX.
"""
from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

_rng = np.random.default_rng(0)


def set_seed(seed: int):
    global _rng
    _rng = np.random.default_rng(seed)


def _as_jnp(x, dtype):
    return jnp.asarray(x, dtype=dtype)


def zeros(shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)


def ones(shape, dtype=jnp.float32):
    return jnp.ones(shape, dtype)


def constant(shape, value, dtype=jnp.float32):
    return jnp.full(shape, value, dtype)


def normal(shape, std=0.02, mean=0.0, dtype=jnp.float32):
    return _as_jnp(_rng.normal(mean, std, size=shape), dtype)


def uniform(shape, minval=-0.05, maxval=0.05, dtype=jnp.float32):
    return _as_jnp(_rng.uniform(minval, maxval, size=shape), dtype)


def truncated_normal(shape, std=0.02, mean=0.0, dtype=jnp.float32):
    # truncate at 2 std (matches the reference's trunc-normal convention,
    # reference tlxcv/models/segmentation/unet.py:10-12)
    x = _rng.normal(0.0, 1.0, size=shape)
    bad = np.abs(x) > 2.0
    while bad.any():
        x[bad] = _rng.normal(0.0, 1.0, size=int(bad.sum()))
        bad = np.abs(x) > 2.0
    return _as_jnp(x * std + mean, dtype)


def _fan(shape, conv_in_axis=None):
    """fan_in/fan_out for HWIO conv kernels or (in, out) dense kernels."""
    if len(shape) == 2:  # dense: (in, out)
        return shape[0], shape[1]
    # conv HWIO: (kh, kw, in, out) or (kd, kh, kw, in, out)
    receptive = int(np.prod(shape[:-2]))
    return shape[-2] * receptive, shape[-1] * receptive


def kaiming_normal(shape, mode="fan_in", nonlinearity="relu", dtype=jnp.float32):
    fan_in, fan_out = _fan(shape)
    fan = fan_in if mode == "fan_in" else fan_out
    gain = math.sqrt(2.0) if nonlinearity == "relu" else 1.0
    std = gain / math.sqrt(max(fan, 1))
    return normal(shape, std=std, dtype=dtype)


def kaiming_uniform(shape, mode="fan_in", nonlinearity="relu", dtype=jnp.float32):
    fan_in, fan_out = _fan(shape)
    fan = fan_in if mode == "fan_in" else fan_out
    gain = math.sqrt(2.0) if nonlinearity == "relu" else 1.0
    bound = gain * math.sqrt(3.0 / max(fan, 1))
    return uniform(shape, -bound, bound, dtype)


def xavier_normal(shape, gain=1.0, dtype=jnp.float32):
    fan_in, fan_out = _fan(shape)
    std = gain * math.sqrt(2.0 / max(fan_in + fan_out, 1))
    return normal(shape, std=std, dtype=dtype)


def xavier_uniform(shape, gain=1.0, dtype=jnp.float32):
    fan_in, fan_out = _fan(shape)
    bound = gain * math.sqrt(6.0 / max(fan_in + fan_out, 1))
    return uniform(shape, -bound, bound, dtype)
