"""Pallas TPU kernels: fused 2x bilinear upsample (NHWC).

The segmentation hot path (HRNet fusion, FPN top-down, every seg decoder —
BASELINE config #4) upsamples by exactly 2x with half-pixel centers.  The
generic gather-based formulation issues two weighted gathers through HBM;
:func:`upsample2x_fused` does the whole thing in one VMEM pass per image —
rows then cols as 2D MXU matmuls against static interpolation matrices
(the interleave lives inside the matrices, sidestepping the interleave/
rank-3-dot lowerings this image's Mosaic toolchain rejects).  It COMPILES
on the real v5e chip and beats both the gather path and the two-einsum
:func:`upsample2x_matmul` composition (one HBM round trip instead of two).

Numerics match the half-pixel taps exactly (MXU in HIGHEST precision for
f32):
  out[2k]   = 0.25 * x[k-1] + 0.75 * x[k]     (edge-clamped)
  out[2k+1] = 0.75 * x[k]   + 0.25 * x[k+1]

Gradients: the kernel carries a custom VJP — the backward pass is the
same kernel with transposed matrices (a 2x "downsample" contraction), so
the fused path is safe inside training graphs.

:func:`upsample2x_bilinear` (shift/interleave formulation) remains
correct only in interpret mode on this toolchain and is kept for
documentation/tests.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["upsample2x_bilinear", "upsample2x_matmul", "upsample2x_fused",
           "upsample2x_fits", "upsample_add_fused", "upsample_add_fits",
           "upsample_matmul"]


def _resize_matrix(n_out, n_in, mode="bilinear"):
    """[n_out, n_in] separable interpolation matrix (static numpy).

    bilinear: half-pixel centers (torch align_corners=False).
    nearest:  src = floor(i * n_in / n_out) — matches the gather path in
    ops.image and jax.image.resize for integer upscales."""
    import numpy as np

    A = np.zeros((n_out, n_in), np.float32)
    rows = np.arange(n_out)
    if mode == "nearest":
        idx = np.clip((rows * n_in) // n_out, 0, n_in - 1)
        A[rows, idx] = 1.0
        return A
    src = (rows + 0.5) * n_in / n_out - 0.5
    i0 = np.clip(np.floor(src).astype(int), 0, n_in - 1)
    i1 = np.minimum(i0 + 1, n_in - 1)
    w1 = np.clip(src - np.floor(src), 0, 1)
    w1 = np.where(src < 0, 0.0, w1)
    A[rows, i0] += 1 - w1
    A[rows, i1] += w1
    return A


def _upsample_matrix(n, np_mod):
    """[2n, n] half-pixel 2x bilinear interpolation matrix (static)."""
    return _resize_matrix(2 * n, n)


@functools.partial(jax.jit, static_argnames=("precision",))
def upsample2x_matmul(x, precision=None):
    """2x bilinear upsample as two static matmuls (MXU path), ~1.7x the
    gather-based interpolate on v5e at bf16.

    x [N, H, W, C] -> [N, 2H, 2W, C]; numerics identical to
    interpolate(scale_factor=2, mode='bilinear') up to MXU input
    precision (pass precision='highest' for exact f32).
    """
    import numpy as np

    n, h, w, c = x.shape
    if precision is None:
        precision = "highest" if x.dtype == jnp.float32 else "default"
    Ah = jnp.asarray(_upsample_matrix(h, np), x.dtype)
    Aw = jnp.asarray(_upsample_matrix(w, np), x.dtype)
    y = jnp.einsum("Hh,nhwc->nHwc", Ah, x,
                   preferred_element_type=jnp.float32, precision=precision)
    y = jnp.einsum("Ww,nhwc->nhWc", Aw, y.astype(x.dtype),
                   preferred_element_type=jnp.float32, precision=precision)
    return y.astype(x.dtype)


@functools.partial(jax.jit, static_argnames=("oh", "ow", "mode", "precision"))
def upsample_matmul(x, oh, ow, mode="bilinear", precision=None):
    """General separable resize as two static matmuls (MXU path): the
    same composition as :func:`upsample2x_matmul` for ANY output size —
    this is what HRNet FuseLayers' 4x/8x branch upsamples (backbones/
    hrnet.py FuseLayers) lower to instead of two HBM-bound gathers.

    x [N, H, W, C] -> [N, oh, ow, C]; numerics identical to
    interpolate(mode=..., align_corners=False).
    """
    n, h, w, c = x.shape
    if precision is None:
        precision = "highest" if x.dtype == jnp.float32 else "default"
    Ah = jnp.asarray(_resize_matrix(oh, h, mode), x.dtype)
    Aw = jnp.asarray(_resize_matrix(ow, w, mode), x.dtype)
    y = jnp.einsum("Hh,nhwc->nHwc", Ah, x,
                   preferred_element_type=jnp.float32, precision=precision)
    y = jnp.einsum("Ww,nhwc->nhWc", Aw, y.astype(x.dtype),
                   preferred_element_type=jnp.float32, precision=precision)
    return y.astype(x.dtype)


# --------------------------------------------------------------------------
# Fused one-pass kernel (the production Pallas path)
# --------------------------------------------------------------------------
def _make_sep_kernel(ih, iw, oh, ow, c, exact, with_skip=False):
    prec = jax.lax.Precision.HIGHEST if exact else None

    if with_skip:
        def kernel_add(ah_ref, aw_ref, x_ref, s_ref, o_ref):
            """Same 2D-slab separable resize, plus the consumer add done
            in VMEM: o = resize(x) + skip.  This is where a Pallas kernel
            still wins over XLA (BENCHMARKS.md): the upsampled tensor
            never round-trips HBM before its add."""
            x = x_ref[0]                                    # [IH, IW*C]
            y = jnp.dot(ah_ref[:], x, precision=prec,
                        preferred_element_type=jnp.float32).astype(x.dtype)
            y = y.reshape(oh, iw, c).transpose(1, 0, 2).reshape(iw, oh * c)
            z = jnp.dot(aw_ref[:], y, precision=prec,
                        preferred_element_type=jnp.float32).astype(x.dtype)
            z = z.reshape(ow, oh, c).transpose(1, 0, 2)     # [OH, OW, C]
            o_ref[0] = z.reshape(oh, ow * c) + s_ref[0]

        return kernel_add

    def kernel(ah_ref, aw_ref, x_ref, o_ref):
        """One VMEM pass: rows then cols, both as 2D MXU matmuls against
        static separable matrices Ah [OH, IH] / Aw [OW, IW].  The 2x
        interleave lives INSIDE the matrices (row 2k holds the
        (0.25, 0.75) taps), so the kernel needs no stack/interleave; the
        only shape ops are lane-aligned minor-dim reshapes and major-dim
        transposes — the constructs this image's Mosaic toolchain accepts
        (the rank-3 dot_general it rejects is avoided; CLAUDE.md
        '2D-slab layouts')."""
        x = x_ref[0]                                        # [IH, IW*C]
        y = jnp.dot(ah_ref[:], x, precision=prec,
                    preferred_element_type=jnp.float32).astype(x.dtype)
        y = y.reshape(oh, iw, c).transpose(1, 0, 2).reshape(iw, oh * c)
        z = jnp.dot(aw_ref[:], y, precision=prec,
                    preferred_element_type=jnp.float32).astype(x.dtype)
        z = z.reshape(ow, oh, c).transpose(1, 0, 2)         # [OH, OW, C]
        o_ref[0] = z.reshape(oh, ow * c)

    return kernel


def _apply_sep_matrices(x, ah, aw, exact, interpret):
    """out[n, i, j, c] = sum_{h, w} ah[i, h] aw[j, w] x[n, h, w, c] as a
    single Pallas kernel (one HBM read + one HBM write per image)."""
    n, ih, iw, c = x.shape
    oh, ow = ah.shape[0], aw.shape[0]
    x2 = x.reshape(n, ih, iw * c)
    out = pl.pallas_call(
        _make_sep_kernel(ih, iw, oh, ow, c, exact),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((oh, ih), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ow, iw), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ih, iw * c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, oh, ow * c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, oh, ow * c), x.dtype),
        interpret=interpret,
    )(ah.astype(x.dtype), aw.astype(x.dtype), x2)
    return out.reshape(n, oh, ow, c)


def _apply_sep_matrices_add(x, skip, ah, aw, exact, interpret):
    """out[n, i, j, c] = skip[n, i, j, c] + sum_{h,w} ah[i,h] aw[j,w]
    x[n, h, w, c] as ONE Pallas kernel — the upsample feeds its consumer
    add without an HBM round trip of the 4x-size intermediate."""
    n, ih, iw, c = x.shape
    oh, ow = ah.shape[0], aw.shape[0]
    x2 = x.reshape(n, ih, iw * c)
    s2 = skip.reshape(n, oh, ow * c)
    out = pl.pallas_call(
        _make_sep_kernel(ih, iw, oh, ow, c, exact, with_skip=True),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((oh, ih), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ow, iw), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ih, iw * c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, oh, ow * c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, oh, ow * c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, oh, ow * c), x.dtype),
        interpret=interpret,
    )(ah.astype(x.dtype), aw.astype(x.dtype), x2, s2)
    return out.reshape(n, oh, ow, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _fused_up_add(x, skip, mode, exact, interpret):
    import numpy as np  # noqa: F401  (matrix builder uses numpy)

    ih, iw = x.shape[1:3]
    oh, ow = skip.shape[1:3]
    ah = jnp.asarray(_resize_matrix(oh, ih, mode))
    aw = jnp.asarray(_resize_matrix(ow, iw, mode))
    return _apply_sep_matrices_add(x, skip, ah, aw, exact, interpret)


def _fused_up_add_fwd(x, skip, mode, exact, interpret):
    return (_fused_up_add(x, skip, mode, exact, interpret),
            (x.shape[1:3], skip.shape[1:3]))


def _fused_up_add_bwd(mode, exact, interpret, res, g):
    """d_skip = g; d_x = the transposed separable contraction of g (the
    plain no-skip kernel with A^T matrices)."""
    (ih, iw), (oh, ow) = res
    ah_t = jnp.asarray(_resize_matrix(oh, ih, mode).T)  # [IH, OH]
    aw_t = jnp.asarray(_resize_matrix(ow, iw, mode).T)  # [IW, OW]
    return _apply_sep_matrices(g, ah_t, aw_t, exact, interpret), g


_fused_up_add.defvjp(_fused_up_add_fwd, _fused_up_add_bwd)


@functools.partial(jax.jit,
                   static_argnames=("mode", "interpret", "exact"))
def upsample_add_fused(x, skip, mode="bilinear", interpret=False,
                       exact=None):
    """Fused Pallas resize + add: ``resize(x, skip.shape) + skip`` in one
    VMEM pass per image (x [N, H, W, C], skip [N, OH, OW, C]).

    This is the FPN top-down / seg-decoder hot pattern (Mask R-CNN FPN
    nearest-2x + lateral add, reference fpn.py; HRNet FuseLayers bilinear
    + add): fusing the consumer add is where a Pallas kernel beats XLA's
    einsum composition, whose upsampled intermediate round-trips HBM
    (BENCHMARKS.md round-2 measurement).  Gate with
    :func:`upsample_add_fits`; differentiable via custom VJP.
    """
    if exact is None:
        exact = x.dtype == jnp.float32
    return _fused_up_add(x, skip, mode, exact, interpret)


def upsample_add_fits(x_shape, out_hw, itemsize) -> bool:
    """True when the fused upsample+add kernel supports the shapes:
    C 128-aligned (lane alignment for the in-kernel reshapes) and one
    image's in + skip + out + intermediate working set within the 16 MB
    scoped-VMEM limit (probed: (8, 40, 40, 256) f32 -> 80x80 is rejected
    by the compiler at 20.85M scoped)."""
    n, h, w, c = x_shape
    oh, ow = out_hw
    if c % 128:
        return False
    working = (h * w + 3 * oh * ow + oh * w) * c * itemsize
    mats = 2 * (oh * h + ow * w) * itemsize
    return working + mats <= 14 * 1024 * 1024


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _fused_2x(x, exact, interpret):
    import numpy as np

    h, w = x.shape[1:3]
    ah = jnp.asarray(_upsample_matrix(h, np))
    aw = jnp.asarray(_upsample_matrix(w, np))
    return _apply_sep_matrices(x, ah, aw, exact, interpret)


def _fused_2x_fwd(x, exact, interpret):
    return _fused_2x(x, exact, interpret), None


def _fused_2x_bwd(exact, interpret, _, g):
    """VJP: the same kernel with transposed matrices — a 2x contraction
    back to the input grid (dx = Ah^T · g · Aw layout-wise)."""
    import numpy as np

    h, w = g.shape[1] // 2, g.shape[2] // 2
    ah_t = jnp.asarray(_upsample_matrix(h, np).T)  # [H, 2H]
    aw_t = jnp.asarray(_upsample_matrix(w, np).T)  # [W, 2W]
    return (_apply_sep_matrices(g, ah_t, aw_t, exact, interpret),)


_fused_2x.defvjp(_fused_2x_fwd, _fused_2x_bwd)


@functools.partial(jax.jit, static_argnames=("interpret", "exact"))
def upsample2x_fused(x, interpret=False, exact=None):
    """Fused Pallas 2x bilinear upsample: x [N, H, W, C] -> [N, 2H, 2W, C]
    with ONE HBM read + ONE HBM write per image (the two-einsum
    ``upsample2x_matmul`` round-trips the [N, 2H, W, C] intermediate
    through HBM).  Compiles on this image's Mosaic toolchain (probed on
    the real v5e chip); differentiable via a custom VJP.

    Constraints (use :func:`upsample2x_fits`, else fall back to
    ``upsample2x_matmul``): C a multiple of 128 (lane alignment for the
    in-kernel W*C <-> (W, C) reshapes) and one image's working set within
    VMEM.  ``exact=True`` (default for f32 inputs) runs the MXU in
    HIGHEST precision so numerics match ops.interpolate bit-for-bit-ish.
    """
    if exact is None:
        exact = x.dtype == jnp.float32
    return _fused_2x(x, exact, interpret)


def upsample2x_fits(x_shape, itemsize) -> bool:
    """True when the fused kernel supports this shape AND wins
    (measured on v5e): C must be 128-aligned (lane alignment for the
    in-kernel reshapes); at C=128 with large batch the per-image grid
    steps lose to the batched einsum path, so C=128 only qualifies for
    small batches; the per-image working set must stay within VMEM
    reach."""
    n, h, w, c = x_shape
    if c % 128 or (c < 256 and n > 4):
        return False
    working = 5 * h * w * c * itemsize  # in + out (4x) live together
    mats = (4 * h * h + 4 * w * w) * itemsize
    # empirical ceiling: (4, 64, 64, 256) f32 (20 MB working set) compiles
    # and wins on the v5e toolchain
    return working + mats <= 28 * 1024 * 1024


def _upsample2x_kernel(x_ref, o_ref):
    x = x_ref[0]  # [H, W, C] block for one image

    def lerp_axis(v, axis):
        prev = jnp.concatenate([v[:1] if axis == 0 else v[:, :1],
                                (v[:-1] if axis == 0 else v[:, :-1])], axis)
        nxt = jnp.concatenate([(v[1:] if axis == 0 else v[:, 1:]),
                               v[-1:] if axis == 0 else v[:, -1:]], axis)
        even = 0.25 * prev + 0.75 * v
        odd = 0.75 * v + 0.25 * nxt
        # interleave along `axis`
        stacked = jnp.stack([even, odd], axis=axis + 1)
        shape = list(v.shape)
        shape[axis] = shape[axis] * 2
        return stacked.reshape(shape)

    y = lerp_axis(x, 0)
    y = lerp_axis(y, 1)
    o_ref[0] = y


def _pick_c_tile(h, w, c, itemsize):
    """Channel tile so in+out+temps stay well under VMEM (~16MB/core).
    The filter is per-channel separable, so channel tiling needs no halo."""
    budget = 4 * 1024 * 1024  # bytes for the input block; temps ~6x that
    c_tile = max(1, budget // max(h * w * itemsize, 1))
    c_tile = min(c, c_tile)
    # largest divisor of c that is <= c_tile (keeps the grid exact)
    while c % c_tile:
        c_tile -= 1
    return c_tile


@functools.partial(jax.jit, static_argnames=("interpret",))
def upsample2x_bilinear(x, interpret=False):
    """x [N, H, W, C] -> [N, 2H, 2W, C], bilinear half-pixel."""
    n, h, w, c = x.shape
    ct = _pick_c_tile(h, w, c, x.dtype.itemsize)
    return pl.pallas_call(
        _upsample2x_kernel,
        grid=(n, c // ct),
        in_specs=[pl.BlockSpec((1, h, w, ct), lambda i, j: (i, 0, 0, j),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 2 * h, 2 * w, ct),
                               lambda i, j: (i, 0, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 2 * h, 2 * w, c), x.dtype),
        interpret=interpret,
    )(x)
