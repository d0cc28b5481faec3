"""Generic detection post-processing helpers
(reference tlxcv/models/detection/utils/post_process.py:8-133
BBoxPostProcess — decode→NMS happens inside each detector here; this
module provides the rescale-to-original-image step and result
conversion, with static shapes)."""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["rescale_dets", "cvt_results"]


def rescale_dets(dets, counts, scale_factor, orig_hw=None):
    """Map padded dets [N, K, 6] from network-input pixels back to the
    original image (divide by per-image scale, clip, drop empties).

    scale_factor: [N, 2] (sy, sx) — the resize factor applied during
    preprocessing (reference post_process.py:96-130).
    """
    sy = scale_factor[:, 0][:, None]
    sx = scale_factor[:, 1][:, None]
    boxes = dets[..., 2:6]
    boxes = jnp.stack([boxes[..., 0] / sx, boxes[..., 1] / sy,
                       boxes[..., 2] / sx, boxes[..., 3] / sy], -1)
    if orig_hw is not None:
        h = orig_hw[:, 0].astype(boxes.dtype)[:, None]
        w = orig_hw[:, 1].astype(boxes.dtype)[:, None]
        boxes = jnp.stack([
            jnp.clip(boxes[..., 0], 0, w), jnp.clip(boxes[..., 1], 0, h),
            jnp.clip(boxes[..., 2], 0, w), jnp.clip(boxes[..., 3], 0, h)], -1)
    # zero-area boxes become invalid
    nonempty = ((boxes[..., 2] > boxes[..., 0]) &
                (boxes[..., 3] > boxes[..., 1]) & (dets[..., 0] >= 0))
    dets = jnp.concatenate([dets[..., :2], boxes], -1)
    dets = jnp.where(nonempty[..., None], dets,
                     jnp.asarray([-1, 0, 0, 0, 0, 0], dets.dtype))
    return dets, nonempty.sum(-1)


def cvt_results(dets, counts):
    """Unbatch padded detections to per-image numpy dicts (host side,
    reference utils/ops.py:397-406)."""
    out = []
    dets = np.asarray(dets)
    counts = np.asarray(counts)
    for det, n in zip(dets, counts):
        n = int(n)
        valid = det[det[:, 0] >= 0][:n]
        out.append({"labels": valid[:, 0].astype(np.int64),
                    "scores": valid[:, 1],
                    "boxes": valid[:, 2:6]})
    return out
