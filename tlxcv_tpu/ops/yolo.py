"""YOLO box decode — pure-JAX replacement for paddle.vision.ops.yolo_box
(reference tlxcv/models/detection/utils/ops.py:450-452 escape #2 and the
grid/anchor math in bbox_utils.py:204 decode_yolo).

NHWC: head output is [N, H, W, na*(5+nc)].
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["yolo_box"]


def yolo_box(x, img_size, anchors, class_num: int, conf_thresh: float = 0.005,
             downsample_ratio: int = 32, clip_bbox: bool = True,
             scale_x_y: float = 1.0):
    """Decode one YOLO head level.

    Args:
      x: [N, H, W, na*(5+nc)] raw head output (NHWC).
      img_size: [N, 2] original image (h, w), int.
      anchors: flat list [w0, h0, w1, h1, ...] in network-input pixels.
      class_num: number of classes.
      conf_thresh: boxes with objectness below this get zeroed
        (paddle yolo_box semantics).
      downsample_ratio: stride of this level (32/16/8).
      scale_x_y: center scaling (1.0 for vanilla YOLOv3).

    Returns:
      boxes [N, H*W*na, 4] xyxy in original-image pixels,
      scores [N, H*W*na, class_num] = sigmoid(obj) * sigmoid(cls).
    """
    n, h, w, _ = x.shape
    na = len(anchors) // 2
    an = jnp.asarray(anchors, x.dtype).reshape(na, 2)  # (w, h)

    x = x.reshape(n, h, w, na, 5 + class_num)
    tx, ty, tw, th = x[..., 0], x[..., 1], x[..., 2], x[..., 3]
    obj = jax.nn.sigmoid(x[..., 4:5])
    cls = jax.nn.sigmoid(x[..., 5:])

    gx = jax.lax.broadcasted_iota(x.dtype, (h, w), 1)[None, :, :, None]
    gy = jax.lax.broadcasted_iota(x.dtype, (h, w), 0)[None, :, :, None]
    bias = 0.5 * (scale_x_y - 1.0)
    cx = (gx + scale_x_y * jax.nn.sigmoid(tx) - bias) / w
    cy = (gy + scale_x_y * jax.nn.sigmoid(ty) - bias) / h
    # anchor sizes are in network-input pixels; normalize by input extent
    # (clamped: raw logits can overflow exp in f32 on untrained heads)
    bw = jnp.exp(jnp.clip(tw, -10.0, 10.0)) * an[:, 0] / (w * downsample_ratio)
    bh = jnp.exp(jnp.clip(th, -10.0, 10.0)) * an[:, 1] / (h * downsample_ratio)

    img_h = img_size[:, 0].astype(x.dtype).reshape(n, 1, 1, 1)
    img_w = img_size[:, 1].astype(x.dtype).reshape(n, 1, 1, 1)
    x1 = (cx - bw * 0.5) * img_w
    y1 = (cy - bh * 0.5) * img_h
    x2 = (cx + bw * 0.5) * img_w
    y2 = (cy + bh * 0.5) * img_h
    if clip_bbox:
        x1 = jnp.clip(x1, 0.0, img_w - 1.0)
        y1 = jnp.clip(y1, 0.0, img_h - 1.0)
        x2 = jnp.clip(x2, 0.0, img_w - 1.0)
        y2 = jnp.clip(y2, 0.0, img_h - 1.0)
    boxes = jnp.stack([x1, y1, x2, y2], axis=-1)

    keep = obj >= conf_thresh  # [n, h, w, na, 1] — broadcasts over the 4 coords
    boxes = jnp.where(keep, boxes, 0.0)
    scores = obj * cls
    scores = jnp.where(keep, scores, 0.0)
    return (boxes.reshape(n, h * w * na, 4),
            scores.reshape(n, h * w * na, class_num))
