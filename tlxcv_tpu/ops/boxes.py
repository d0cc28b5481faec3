"""Box geometry ops (pure JAX, shape-polymorphic over leading dims).

TPU-native re-expression of the reference's bbox math
(reference tlxcv/models/detection/utils/bbox_utils.py:7-442).  All
functions are tensorized, jit-safe, and layout-free ([..., 4] boxes).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "xywh2xyxy", "xyxy2xywh", "box_area", "pairwise_iou", "aligned_iou",
    "bbox_iou", "bbox2delta", "delta2bbox", "distance2bbox", "bbox2distance",
    "batch_distance2bbox", "clip_boxes",
]

EPS = 1e-9


def xywh2xyxy(b):
    """[cx, cy, w, h] -> [x1, y1, x2, y2] (reference bbox_utils.py:190)."""
    cx, cy, w, h = jnp.split(b, 4, axis=-1)
    return jnp.concatenate([cx - w * 0.5, cy - h * 0.5, cx + w * 0.5, cy + h * 0.5], -1)


def xyxy2xywh(b):
    x1, y1, x2, y2 = jnp.split(b, 4, axis=-1)
    return jnp.concatenate([(x1 + x2) * 0.5, (y1 + y2) * 0.5, x2 - x1, y2 - y1], -1)


def box_area(b):
    return jnp.maximum(b[..., 2] - b[..., 0], 0) * jnp.maximum(b[..., 3] - b[..., 1], 0)


def pairwise_iou(a, b):
    """IoU matrix between a [..., M, 4] and b [..., N, 4] -> [..., M, N].

    (reference bbox_utils.py:88 bbox_overlaps / :231 batch_iou_similarity)
    """
    lt = jnp.maximum(a[..., :, None, :2], b[..., None, :, :2])
    rb = jnp.minimum(a[..., :, None, 2:], b[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(a)[..., :, None] + box_area(b)[..., None, :] - inter
    return inter / (union + EPS)


def aligned_iou(a, b, mode: str = "iou", eps: float = 1e-9):
    """Element-aligned IoU/GIoU/DIoU/CIoU between same-shape [..., 4] boxes
    (reference bbox_utils.py:254 bbox_iou)."""
    x1 = jnp.maximum(a[..., 0], b[..., 0])
    y1 = jnp.maximum(a[..., 1], b[..., 1])
    x2 = jnp.minimum(a[..., 2], b[..., 2])
    y2 = jnp.minimum(a[..., 3], b[..., 3])
    inter = jnp.clip(x2 - x1, 0) * jnp.clip(y2 - y1, 0)
    union = box_area(a) + box_area(b) - inter + eps
    iou = inter / union
    if mode == "iou":
        return iou
    # smallest enclosing box
    cx1 = jnp.minimum(a[..., 0], b[..., 0])
    cy1 = jnp.minimum(a[..., 1], b[..., 1])
    cx2 = jnp.maximum(a[..., 2], b[..., 2])
    cy2 = jnp.maximum(a[..., 3], b[..., 3])
    if mode == "giou":
        c_area = (cx2 - cx1) * (cy2 - cy1) + eps
        return iou - (c_area - union) / c_area
    c2 = (cx2 - cx1) ** 2 + (cy2 - cy1) ** 2 + eps
    rho2 = (((a[..., 0] + a[..., 2]) - (b[..., 0] + b[..., 2])) ** 2 +
            ((a[..., 1] + a[..., 3]) - (b[..., 1] + b[..., 3])) ** 2) / 4.0
    if mode == "diou":
        return iou - rho2 / c2
    if mode == "ciou":
        wa = a[..., 2] - a[..., 0]
        ha = a[..., 3] - a[..., 1]
        wb = b[..., 2] - b[..., 0]
        hb = b[..., 3] - b[..., 1]
        v = (4 / jnp.pi ** 2) * (jnp.arctan(wb / (hb + eps)) - jnp.arctan(wa / (ha + eps))) ** 2
        # alpha is a constant trade-off coefficient in the CIoU paper —
        # the reference sets alpha.stop_gradient=True (bbox_utils.py:306)
        alpha = jax.lax.stop_gradient(v / (v - iou + 1 + eps))
        return iou - (rho2 / c2 + alpha * v)
    raise ValueError(f"unknown iou mode {mode!r}")


bbox_iou = aligned_iou


def bbox2delta(src, tgt, weights=(1.0, 1.0, 1.0, 1.0)):
    """Encode target boxes relative to anchors (reference bbox_utils.py:7).

    Degenerate boxes (zero/negative width) are clamped to a tiny eps
    before the log: an image with ZERO valid GTs gathers a padded
    all-zero target row, and the resulting log(0) = -inf turns every
    `loss * pos_mask` reduction into NaN (inf * 0) even though the row
    is masked out.  With the clamp the row encodes to a large-but-finite
    delta that the mask zeroes cleanly."""
    eps = 1e-4
    sw = jnp.maximum(src[..., 2] - src[..., 0], eps)
    sh = jnp.maximum(src[..., 3] - src[..., 1], eps)
    scx = src[..., 0] + sw * 0.5
    scy = src[..., 1] + sh * 0.5
    tw = jnp.maximum(tgt[..., 2] - tgt[..., 0], eps)
    th = jnp.maximum(tgt[..., 3] - tgt[..., 1], eps)
    tcx = tgt[..., 0] + tw * 0.5
    tcy = tgt[..., 1] + th * 0.5
    wx, wy, ww, wh = weights
    return jnp.stack([
        wx * (tcx - scx) / sw, wy * (tcy - scy) / sh,
        ww * jnp.log(tw / sw), wh * jnp.log(th / sh),
    ], axis=-1)


def delta2bbox(deltas, boxes, weights=(1.0, 1.0, 1.0, 1.0), max_ratio=16 / 1000.0):
    """Decode deltas against anchors (reference bbox_utils.py:33)."""
    import math

    clip = abs(math.log(max_ratio))
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    cx = boxes[..., 0] + w * 0.5
    cy = boxes[..., 1] + h * 0.5
    wx, wy, ww, wh = weights
    dx = deltas[..., 0] / wx
    dy = deltas[..., 1] / wy
    dw = jnp.clip(deltas[..., 2] / ww, -clip, clip)
    dh = jnp.clip(deltas[..., 3] / wh, -clip, clip)
    pcx = cx + dx * w
    pcy = cy + dy * h
    pw = w * jnp.exp(dw)
    ph = h * jnp.exp(dh)
    return jnp.stack([pcx - pw * 0.5, pcy - ph * 0.5,
                      pcx + pw * 0.5, pcy + ph * 0.5], axis=-1)


def distance2bbox(points, distance, max_shape=None):
    """(l, t, r, b) distances from points -> xyxy (reference bbox_utils.py:335)."""
    x1 = points[..., 0] - distance[..., 0]
    y1 = points[..., 1] - distance[..., 1]
    x2 = points[..., 0] + distance[..., 2]
    y2 = points[..., 1] + distance[..., 3]
    out = jnp.stack([x1, y1, x2, y2], -1)
    if max_shape is not None:
        h, w = max_shape
        out = jnp.stack([jnp.clip(x1, 0, w), jnp.clip(y1, 0, h),
                         jnp.clip(x2, 0, w), jnp.clip(y2, 0, h)], -1)
    return out


def bbox2distance(points, bbox, max_dis=None, eps=0.1):
    """xyxy -> (l, t, r, b) distances (reference bbox_utils.py:311)."""
    l = points[..., 0] - bbox[..., 0]
    t = points[..., 1] - bbox[..., 1]
    r = bbox[..., 2] - points[..., 0]
    b = bbox[..., 3] - points[..., 1]
    out = jnp.stack([l, t, r, b], -1)
    if max_dis is not None:
        out = jnp.clip(out, 0, max_dis - eps)
    return out


def batch_distance2bbox(points, distance, max_shapes=None):
    """Batched distance decode (reference bbox_utils.py:367)."""
    lt = points - distance[..., :2]
    rb = points + distance[..., 2:]
    out = jnp.concatenate([lt, rb], -1)
    if max_shapes is not None:
        hw = max_shapes[..., None, :]  # [B, 1, 2] (h, w)
        maxes = jnp.concatenate([hw[..., 1:2], hw[..., 0:1]] * 2, -1)
        out = jnp.clip(out, 0.0, maxes)
    return out


def clip_boxes(boxes, im_shape):
    """Clip xyxy boxes to (h, w)."""
    h, w = im_shape
    return jnp.stack([
        jnp.clip(boxes[..., 0], 0, w), jnp.clip(boxes[..., 1], 0, h),
        jnp.clip(boxes[..., 2], 0, w), jnp.clip(boxes[..., 3], 0, h),
    ], -1)
