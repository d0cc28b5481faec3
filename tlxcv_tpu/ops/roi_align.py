"""RoIAlign — static-shape bilinear region pooling (BASELINE config #5:
Mask R-CNN needs RPN + RoIAlign + mask paste; the reference snapshot has
no Mask R-CNN source, so this is built to the published op semantics,
matching torchvision.ops.roi_align with aligned=True — the half-pixel
convention Detectron2 uses; sample coords subtract 0.5 before bilinear
lookup).

Implementation: for each RoI output cell, `sampling_ratio`^2 bilinear
samples averaged — expressed as four gathers + weights over the feature
map, fully vectorized (no loops), so XLA maps it onto gathers + VPU math.

NOTE on defaults: these ops default to `sampling_ratio=2` (the
torchvision convention), but `MaskRCNN` passes `sampling_ratio=1` for
both branches by default — TPU gathers at these row widths are
volume-bound (~40 GB/s, BENCHMARKS.md) and sr=1 halves the fetched
bytes for a 1.9x end-to-end win with no reference weights to stay
numerically faithful to.  Anything loading reference-pretrained
weights should construct `MaskRCNN(box_sampling_ratio=2,
mask_sampling_ratio=2)` to restore exact torchvision semantics.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["roi_align", "multilevel_roi_align", "paste_masks"]


@functools.partial(jax.jit, static_argnames=("output_size", "sampling_ratio",
                                             "strides", "gather_impl",
                                             "_interpret"))
def multilevel_roi_align(feats, boxes, output_size: int = 7,
                         sampling_ratio: int = 2, strides=(4, 8, 16, 32),
                         gather_impl: str = "xla", _interpret: bool = False):
    """FPN RoIAlign with per-box level selection over a FLATTENED pyramid.

    The naive static-shape formulation computes RoIAlign on every level
    and one-hot-selects (4x the gather volume — the round-1 Mask R-CNN
    bottleneck).  Here all levels are concatenated into one [N, sum(HW), C]
    table; each box computes its canonical FPN level k and its sample
    coordinates IN THAT LEVEL, then issues exactly one level's worth of
    gathers with flat indices offset by the level start.

    feats: list of [N, H_l, W_l, C] (P2..P5); boxes [N, R, 4] xyxy image
    pixels.  Returns [N, R, S, S, C].
    """
    n, _, _, c = feats[0].shape
    hws = [f.shape[1:3] for f in feats[:len(strides)]]

    # TPU gathers are ROW-COUNT bound (measured ~64M rows/s regardless of
    # row width — 44.6 ms for the 640^2 b8 box branch's 3.2M rows, 4% of
    # HBM bandwidth).  Pack all four bilinear corners into ONE row by
    # concatenating edge-shifted copies channel-wise per level BEFORE
    # flattening: row (y0, x0) of the packed table carries
    # (y0,x0), (y0,x0+1), (y1,x0), (y1,x1) with edge replication, which
    # matches the clamped x1i/y1i indexing exactly -> identical numerics,
    # 4x fewer gather rows (the round-2 Mask R-CNN profile's #1 cost).
    def pack4(f):
        sx = jnp.concatenate([f[:, :, 1:], f[:, :, -1:]], axis=2)
        sy = jnp.concatenate([f[:, 1:], f[:, -1:]], axis=1)
        sxy = jnp.concatenate([sy[:, :, 1:], sy[:, :, -1:]], axis=2)
        return jnp.concatenate([f, sx, sy, sxy], axis=-1)

    flat = jnp.concatenate([pack4(f).reshape(n, -1, 4 * c)
                            for f in feats[:len(strides)]], axis=1)
    offs, acc = [], 0
    for h, w in hws:
        offs.append(acc)
        acc += h * w
    level_off = jnp.asarray(offs, jnp.int32)
    level_h = jnp.asarray([h for h, _ in hws], jnp.int32)
    level_w = jnp.asarray([w for _, w in hws], jnp.int32)
    stride_arr = jnp.asarray(strides, jnp.float32)

    s = output_size
    sr = sampling_ratio

    # canonical level: k0 + log2(sqrt(area)/224)
    area = (jnp.maximum(boxes[..., 2] - boxes[..., 0], 1.0) *
            jnp.maximum(boxes[..., 3] - boxes[..., 1], 1.0))
    k = jnp.floor(4 + jnp.log2(jnp.sqrt(area) / 224.0 + 1e-9))
    k = (jnp.clip(k, 2, 5) - 2).astype(jnp.int32)        # [N, R] in 0..3

    if gather_impl in ("pallas", "pallas_bs"):
        # identical math, but the hot gather is ONE whole-batch Pallas
        # row-gather (ops/pallas/gather.py) instead of XLA's generic
        # gather lowering; coordinates/weights are computed batched
        # (they are cheap VPU math either way).  "pallas" = manual
        # async-DMA kernel; "pallas_bs" = BlockSpec-index-map pipeline
        # (the r5 reformulation).
        from .pallas.gather import gather_rows, gather_rows_bs
        if gather_impl == "pallas_bs":
            gather_rows = functools.partial(gather_rows_bs, g=8)

        scale = 1.0 / stride_arr[k]                      # [N, R]
        b = boxes * scale[..., None]
        x1, y1, x2, y2 = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
        bin_h = jnp.maximum(y2 - y1, 1.0) / s
        bin_w = jnp.maximum(x2 - x1, 1.0) / s
        iy = (jnp.arange(s * sr) + 0.5) / sr
        ys = y1[..., None] + bin_h[..., None] * iy - 0.5  # [N, R, S]
        xs = x1[..., None] + bin_w[..., None] * iy - 0.5
        hk = level_h[k].astype(jnp.float32)[..., None]    # [N, R, 1]
        wk = level_w[k].astype(jnp.float32)[..., None]

        vy = ((ys > -1.0) & (ys < hk))[:, :, :, None]
        vx = ((xs > -1.0) & (xs < wk))[:, :, None, :]
        ys = jnp.clip(ys, 0, hk - 1)   # torchvision edge clamp (ly=0)
        xs = jnp.clip(xs, 0, wk - 1)
        y0 = jnp.floor(ys)
        x0 = jnp.floor(xs)
        wy1 = (ys - y0)[:, :, :, None]                   # [N, R, S, 1]
        wx1 = (xs - x0)[:, :, None, :]                   # [N, R, 1, S]
        y0i = y0.astype(jnp.int32)
        x0i = x0.astype(jnp.int32)
        valid = (vy & vx)[..., None]

        off = level_off[k][..., None]                    # [N, R, 1]
        wki = level_w[k][..., None]
        row0 = off + y0i * wki                           # [N, R, S]
        idx = row0[:, :, :, None] + x0i[:, :, None, :]   # [N, R, S, S]
        total = flat.shape[1]
        gidx = idx + (jnp.arange(n, dtype=jnp.int32) * total
                      )[:, None, None, None]
        v = gather_rows(flat.reshape(n * total, 4 * c), gidx.reshape(-1),
                        interpret=_interpret)
        v = v.reshape(idx.shape + (4 * c,))
        v00 = v[..., 0 * c:1 * c]
        v01 = v[..., 1 * c:2 * c]
        v10 = v[..., 2 * c:3 * c]
        v11 = v[..., 3 * c:4 * c]
        out = (v00 * (1 - wy1[..., None]) * (1 - wx1[..., None])
               + v01 * (1 - wy1[..., None]) * wx1[..., None]
               + v10 * wy1[..., None] * (1 - wx1[..., None])
               + v11 * wy1[..., None] * wx1[..., None])
        out = jnp.where(valid, out, 0.0)
        r = out.shape[1]
        out = out.reshape(n, r, s, sr, s, sr, c)
        return out.mean(axis=(3, 5))

    def per_image(table, bxs, ks):
        scale = 1.0 / stride_arr[ks]                     # [R]
        b = bxs * scale[:, None]
        x1, y1, x2, y2 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
        bin_h = jnp.maximum(y2 - y1, 1.0) / s
        bin_w = jnp.maximum(x2 - x1, 1.0) / s
        iy = (jnp.arange(s * sr) + 0.5) / sr
        ys = y1[:, None] + bin_h[:, None] * iy[None, :] - 0.5   # [R, s*sr]
        xs = x1[:, None] + bin_w[:, None] * iy[None, :] - 0.5
        hk = level_h[ks].astype(jnp.float32)[:, None]    # [R, 1]
        wk = level_w[ks].astype(jnp.float32)[:, None]

        vy = ((ys > -1.0) & (ys < hk))[:, :, None]
        vx = ((xs > -1.0) & (xs < wk))[:, None, :]
        ys = jnp.clip(ys, 0, hk - 1)   # torchvision edge clamp (ly=0)
        xs = jnp.clip(xs, 0, wk - 1)
        y0 = jnp.floor(ys)
        x0 = jnp.floor(xs)
        wy1 = (ys - y0)[:, :, None]                      # [R, S, 1]
        wx1 = (xs - x0)[:, None, :]                      # [R, 1, S]
        y0i = y0.astype(jnp.int32)
        x0i = x0.astype(jnp.int32)
        valid = (vy & vx)[..., None]

        off = level_off[ks][:, None]                     # [R, 1]
        wki = level_w[ks][:, None]
        row0 = off + y0i * wki                           # [R, S]

        # ONE gather: each packed row holds all four corners (see pack4)
        idx = row0[:, :, None] + x0i[:, None, :]         # [R, S, S]
        v = table[idx.reshape(-1)].reshape(idx.shape + (4 * c,))
        v00 = v[..., 0 * c:1 * c]
        v01 = v[..., 1 * c:2 * c]
        v10 = v[..., 2 * c:3 * c]
        v11 = v[..., 3 * c:4 * c]
        out = (v00 * (1 - wy1[..., None]) * (1 - wx1[..., None])
               + v01 * (1 - wy1[..., None]) * wx1[..., None]
               + v10 * wy1[..., None] * (1 - wx1[..., None])
               + v11 * wy1[..., None] * wx1[..., None])
        out = jnp.where(valid, out, 0.0)
        r = out.shape[0]
        out = out.reshape(r, s, sr, s, sr, c)
        return out.mean(axis=(2, 4))

    return jax.vmap(per_image)(flat, boxes, k)


def _bilinear_gather(feat, ys, xs):
    """feat [H, W, C]; ys/xs [...] float coords -> [..., C]."""
    h, w, c = feat.shape
    # out-of-bounds samples contribute zero (torchvision semantics)
    valid = ((ys > -1.0) & (ys < h) & (xs > -1.0) & (xs < w))[..., None]
    # clamp BEFORE the weights: torchvision's bilinear_interpolate sets
    # y<=0 -> y=0 (ly=0, row 0 exactly); the unclamped floor blended
    # rows 0/1 for samples in (-1, 0)
    ys = jnp.clip(ys, 0, h - 1)
    xs = jnp.clip(xs, 0, w - 1)
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy1 = ys - y0
    wx1 = xs - x0
    y0i = y0.astype(jnp.int32)
    y1i = jnp.clip(y0i + 1, 0, h - 1)
    x0i = x0.astype(jnp.int32)
    x1i = jnp.clip(x0i + 1, 0, w - 1)

    def g(yi, xi):
        return feat[yi, xi]

    v00 = g(y0i, x0i)
    v01 = g(y0i, x1i)
    v10 = g(y1i, x0i)
    v11 = g(y1i, x1i)
    wy1 = wy1[..., None]
    wx1 = wx1[..., None]
    out = (v00 * (1 - wy1) * (1 - wx1) + v01 * (1 - wy1) * wx1 +
           v10 * wy1 * (1 - wx1) + v11 * wy1 * wx1)
    return jnp.where(valid, out, 0.0)


@functools.partial(jax.jit, static_argnames=("output_size", "sampling_ratio"))
def roi_align(features, boxes, output_size: int = 7,
              spatial_scale: float = 1.0, sampling_ratio: int = 2):
    """features [N, H, W, C]; boxes [N, R, 4] xyxy in image coords.

    Returns [N, R, S, S, C] (S = output_size).
    """
    s = output_size
    sr = sampling_ratio

    def per_image(feat, bxs):
        b = bxs * spatial_scale
        x1, y1, x2, y2 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
        rw = jnp.maximum(x2 - x1, 1.0)
        rh = jnp.maximum(y2 - y1, 1.0)
        bin_h = rh / s
        bin_w = rw / s
        # sample grid: [R, s*sr] per axis
        iy = (jnp.arange(s * sr) + 0.5) / sr  # positions in bin units
        ys = y1[:, None] + bin_h[:, None] * iy[None, :]
        xs = x1[:, None] + bin_w[:, None] * iy[None, :]
        yy = jnp.broadcast_to(ys[:, :, None], ys.shape + (s * sr,))
        xx = jnp.broadcast_to(xs[:, None, :], (xs.shape[0], s * sr, s * sr))
        vals = _bilinear_gather(feat, yy - 0.5, xx - 0.5)  # [R, sr*s, sr*s, C]
        r = vals.shape[0]
        c = vals.shape[-1]
        vals = vals.reshape(r, s, sr, s, sr, c)
        return vals.mean(axis=(2, 4))

    return jax.vmap(per_image)(features, boxes)


@functools.partial(jax.jit, static_argnames=("image_hw",))
def paste_masks(masks, boxes, image_hw):
    """Paste per-RoI masks into full-image masks.

    masks [R, M, M] (logits or probs), boxes [R, 4] xyxy pixels.
    Returns [R, H, W] — each mask bilinearly resampled into its box.
    """
    h, w = image_hw
    m = masks.shape[-1]

    def per_roi(mask, box):
        x1, y1, x2, y2 = box
        bw = jnp.maximum(x2 - x1, 1.0)
        bh = jnp.maximum(y2 - y1, 1.0)
        ys = (jnp.arange(h) + 0.5 - y1) / bh * m - 0.5
        xs = (jnp.arange(w) + 0.5 - x1) / bw * m - 0.5
        yy = jnp.broadcast_to(ys[:, None], (h, w))
        xx = jnp.broadcast_to(xs[None, :], (h, w))
        # _bilinear_gather already zeroes out-of-bounds samples with
        # this exact (> -1, < size) condition
        return _bilinear_gather(mask[..., None], yy, xx)[..., 0]

    return jax.vmap(per_roi)(masks, boxes)
