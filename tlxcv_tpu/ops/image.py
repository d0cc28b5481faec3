"""On-device image ops: resize/interpolate, max-unpool, unfold.

Replaces backend escapes #4 (interpolate), #6 (unfold), #7 (max_unpool2d)
from SURVEY.md §2.9 (reference tlxcv/models/detection/utils/ops.py:455-508,
classification/rednet.py:54, segmentation/enet.py:723).

All NHWC.  `interpolate` reproduces torch/paddle coordinate semantics for
both align_corners settings as separable 1-D weighted gathers — XLA fuses
these into efficient TPU gathers; a Pallas fused-upsample kernel can slot
in underneath without changing the API.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["interpolate", "resize", "upsample_add", "max_pool2d_with_argmax",
           "max_unpool2d", "unfold", "pad2d"]


def _out_size(in_hw, size, scale_factor):
    if size is not None:
        return tuple(int(s) for s in (size if isinstance(size, (tuple, list)) else (size, size)))
    if isinstance(scale_factor, (tuple, list)):
        sh, sw = scale_factor
    else:
        sh = sw = scale_factor
    return int(in_hw[0] * sh), int(in_hw[1] * sw)


def _linear_weights(in_size, out_size, align_corners, dtype):
    i = jnp.arange(out_size, dtype=dtype)
    if align_corners and out_size > 1:
        src = i * (in_size - 1) / (out_size - 1)
    else:
        src = (i + 0.5) * in_size / out_size - 0.5
    src = jnp.clip(src, 0.0, in_size - 1)
    i0 = jnp.floor(src).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, in_size - 1)
    w1 = src - i0.astype(dtype)
    return i0, i1, w1


def _resize_axis_linear(x, out_size, axis, align_corners):
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    i0, i1, w1 = _linear_weights(in_size, out_size, align_corners, jnp.float32)
    a = jnp.take(x, i0, axis=axis)
    b = jnp.take(x, i1, axis=axis)
    shape = [1] * x.ndim
    shape[axis] = out_size
    w1 = w1.reshape(shape).astype(x.dtype)
    return a * (1 - w1) + b * w1


def _resize_axis_nearest(x, out_size, axis):
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    # torch legacy 'nearest': src = floor(i * in / out)
    idx = jnp.floor(jnp.arange(out_size, dtype=jnp.float32) * in_size / out_size)
    idx = jnp.clip(idx.astype(jnp.int32), 0, in_size - 1)
    return jnp.take(x, idx, axis=axis)


def _tpu_default_backend() -> bool:
    try:
        import jax

        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def interpolate(x, size=None, scale_factor=None, mode="bilinear",
                align_corners=False, fast_path=True):
    """NHWC resize with torch/paddle F.interpolate coordinate semantics
    (reference escape #4, used by every FPN/seg decoder).

    The exact-2x bilinear half-pixel case — the seg/FPN hot path
    (BASELINE config #4) — routes to the MXU-matmul composition
    (ops/pallas/upsample.upsample2x_matmul): measured fastest INSIDE
    compiled graphs on v5e (chained in-jit bench, BENCHMARKS.md; the
    fused Pallas kernel ties only in the dispatch-bound standalone
    regime and is compile-fragile at large blocks, so it stays opt-in
    via upsample2x_fused).  ``fast_path=False`` forces the reference
    gather formulation (numerics tests)."""
    oh, ow = _out_size(x.shape[1:3], size, scale_factor)
    if (fast_path and mode == "bilinear" and not align_corners
            and x.ndim == 4 and oh == 2 * x.shape[1] and ow == 2 * x.shape[2]
            and x.dtype in (jnp.float32, jnp.bfloat16)):
        from .pallas.upsample import upsample2x_matmul

        return upsample2x_matmul(x)
    if (fast_path and mode == "bilinear" and not align_corners
            and x.ndim == 4 and oh > x.shape[1] and ow > x.shape[2]
            and oh % x.shape[1] == 0 and ow % x.shape[2] == 0
            and x.dtype in (jnp.float32, jnp.bfloat16)):
        # integer >=2x upscale (HRNet FuseLayers 4x/8x, seg-head final
        # 4x): same separable static-matrix MXU composition as the 2x
        # fast path; torch-parity covered by test_interpolate_matches_torch
        from .pallas.upsample import upsample_matmul

        return upsample_matmul(x, oh, ow, mode="bilinear")
    if mode in ("nearest",):
        x = _resize_axis_nearest(x, oh, 1)
        x = _resize_axis_nearest(x, ow, 2)
        return x
    if mode in ("bilinear", "linear"):
        x = _resize_axis_linear(x, oh, 1, align_corners)
        x = _resize_axis_linear(x, ow, 2, align_corners)
        return x
    if mode == "bicubic":
        # delegate to jax.image (half-pixel centers == align_corners=False)
        n, _, _, c = x.shape
        return jax.image.resize(x, (n, oh, ow, c), "cubic").astype(x.dtype)
    raise ValueError(f"unknown interpolate mode {mode!r}")


resize = interpolate


def upsample_add(x, skip, mode="bilinear", align_corners=False,
                 fast_path=True, use_pallas=False):
    """``interpolate(x, size=skip.shape[1:3], mode=mode) + skip`` — the
    FPN top-down / HRNet-fuse / seg-decoder hot pattern.

    Default is the XLA composition: measured chained-in-jit on v5e
    (BENCHMARKS.md round 2), XLA's fused resize+add BEATS the one-pass
    Pallas kernel at FPN shapes (105 vs 189 us/op at 20->40 c256 b8),
    and larger working sets exceed the 16 MB scoped-VMEM limit — the
    regime where VMEM fusion could win does not exist on this toolchain.
    ``use_pallas=True`` opts into ops/pallas/upsample.upsample_add_fused
    where :func:`~tlxcv_tpu.ops.pallas.upsample.upsample_add_fits`."""
    oh, ow = skip.shape[1:3]
    if (use_pallas and fast_path and not align_corners and x.ndim == 4
            and mode in ("bilinear", "nearest")
            and oh >= x.shape[1] and ow >= x.shape[2]
            and x.dtype in (jnp.float32, jnp.bfloat16)
            and x.dtype == skip.dtype):
        from .pallas.upsample import upsample_add_fits, upsample_add_fused

        if upsample_add_fits(x.shape, (oh, ow), x.dtype.itemsize):
            return upsample_add_fused(x, skip, mode=mode)
    if mode == "nearest" and oh == 2 * x.shape[1] and ow == 2 * x.shape[2]:
        # nearest-2x: XLA lowers this resize to a broadcast-reshape, the
        # fastest measured composition (fpn 20->40 c256 b8: 105 us/op)
        return jax.image.resize(x, (*x.shape[:1], oh, ow, x.shape[3]),
                                "nearest") + skip
    return interpolate(x, size=(oh, ow), mode=mode,
                       align_corners=align_corners,
                       fast_path=fast_path) + skip


def max_pool2d_with_argmax(x, kernel_size, stride=None, padding=0):
    """Max pool returning (values, flat indices into H*W per (n, c)).

    TPU-native pair for max_unpool2d (reference enet.py:723): implemented
    as a reduce_window over (value, index) pairs.
    """
    k = (kernel_size, kernel_size) if isinstance(kernel_size, int) else tuple(kernel_size)
    s = k if stride is None else ((stride, stride) if isinstance(stride, int) else tuple(stride))
    p = (padding, padding) if isinstance(padding, int) else tuple(padding)
    n, h, w, c = x.shape
    flat_idx = (jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) * w +
                jax.lax.broadcasted_iota(jnp.int32, (h, w), 1))
    flat_idx = jnp.broadcast_to(flat_idx[None, :, :, None], x.shape)

    neg = jnp.finfo(x.dtype).min if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min

    def reducer(a, b):
        av, ai = a
        bv, bi = b
        take_b = bv > av
        return (jnp.where(take_b, bv, av), jnp.where(take_b, bi, ai))

    dims = (1,) + k + (1,)
    strides = (1,) + s + (1,)
    pads = [(0, 0), (p[0], p[0]), (p[1], p[1]), (0, 0)]
    vals, idxs = lax.reduce_window(
        (x, flat_idx), (neg, jnp.int32(-1)), reducer, dims, strides, pads)
    return vals, idxs


def max_unpool2d(x, indices, output_hw):
    """Scatter pooled values back to their argmax positions (zeros elsewhere)."""
    n, h, w, c = x.shape
    oh, ow = output_hw
    flat = x.reshape(n, h * w, c)
    fidx = indices.reshape(n, h * w, c)
    out = jnp.zeros((n, oh * ow, c), x.dtype)

    def per_image(o, f, i):
        # scatter per channel: indices differ per channel
        def per_channel(oc, fc, ic):
            return oc.at[ic].set(fc, mode="drop")
        return jax.vmap(per_channel, in_axes=(1, 1, 1), out_axes=1)(o, f, i)

    out = jax.vmap(per_image)(out, flat, fidx)
    return out.reshape(n, oh, ow, c)


def unfold(x, kernel_size, stride=1, padding=0, dilation=1):
    """im2col (torch F.unfold semantics, NHWC input).

    Returns [N, L, kh*kw*C] patches (note: channel-last inside each patch,
    unlike torch's channel-major — callers in this framework use matching
    weight layouts).  Backs Involution (reference rednet.py:54).
    """
    k = (kernel_size, kernel_size) if isinstance(kernel_size, int) else tuple(kernel_size)
    s = (stride, stride) if isinstance(stride, int) else tuple(stride)
    d = (dilation, dilation) if isinstance(dilation, int) else tuple(dilation)
    p = (padding, padding) if isinstance(padding, int) else tuple(padding)
    patches = lax.conv_general_dilated_patches(
        x, filter_shape=k, window_strides=s,
        padding=[(p[0], p[0]), (p[1], p[1])],
        rhs_dilation=d,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # [N, OH, OW, C*kh*kw] with channel-major ordering
    n, oh, ow, _ = patches.shape
    return patches.reshape(n, oh * ow, -1), (oh, ow)


def pad2d(x, padding, mode="constant", value=0.0):
    """NHWC spatial padding. padding = (left, right, top, bottom) torch-style."""
    l, r, t, b = padding
    cfg = [(0, 0), (t, b), (l, r), (0, 0)]
    if mode == "constant":
        return jnp.pad(x, cfg, constant_values=value)
    return jnp.pad(x, cfg, mode={"reflect": "reflect", "replicate": "edge"}[mode])
