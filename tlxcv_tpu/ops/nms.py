"""Fixed-capacity, padded non-maximum suppression for TPU.

Replaces the reference's native-NMS escapes
(reference tlxcv/models/detection/utils/ops.py:126-330 →
paddle._C_ops.multiclass_nms3 / torchvision.ops.batched_nms) with
static-shape JAX: every output is a fixed-size tensor plus a validity
count, so the whole predict path stays inside one jit (SURVEY.md §7
hard part #1).

Algorithm: sort by score once, compute the pairwise IoU matrix of the
top-K candidates, then one `lax.fori_loop` sweep that suppresses
lower-scored overlaps — O(K) iterations of VPU-wide vector ops.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from .boxes import pairwise_iou

__all__ = ["nms", "batched_class_nms", "multiclass_nms"]

NEG_INF = -1e9


def nms(boxes, scores, iou_threshold: float = 0.5, max_outputs: int | None = None,
        score_threshold: float | None = None):
    """Single-class NMS over ``boxes [A, 4]`` / ``scores [A]``.

    Returns ``(keep_idx [K], keep_mask [K])`` where K = max_outputs (or A);
    invalid slots have idx pointing at the highest-score box and mask False.
    Matches torchvision.ops.nms ordering (score-descending).
    """
    num = boxes.shape[0]
    k = num if max_outputs is None else min(max_outputs, num)
    if score_threshold is not None:
        scores = jnp.where(scores >= score_threshold, scores, NEG_INF)
    order = jnp.argsort(-scores)
    sboxes = boxes[order]
    sscores = scores[order]

    iou = pairwise_iou(sboxes, sboxes)
    valid0 = sscores > NEG_INF / 2

    def body(i, alive):
        keep_i = alive[i]
        suppress = (iou[i] > iou_threshold) & keep_i
        # only suppress later (lower-scored) boxes
        idx = lax.broadcasted_iota(jnp.int32, (num,), 0)
        suppress = suppress & (idx > i)
        return alive & ~suppress

    alive = lax.fori_loop(0, num, body, valid0)
    # compact kept indices to the front, preserving score order:
    # sorted position i (if alive) lands in output slot rank(i)
    slot = jnp.where(alive, jnp.cumsum(alive) - 1, num)  # >=k slots dropped
    out_idx = jnp.zeros((k,), jnp.int32).at[slot].set(
        order.astype(jnp.int32), mode="drop")
    n_kept = jnp.sum(alive)
    mask = lax.broadcasted_iota(jnp.int32, (k,), 0) < jnp.minimum(n_kept, k)
    return out_idx, mask


def batched_class_nms(boxes, scores, class_ids, iou_threshold: float,
                      max_outputs: int, score_threshold: float | None = None):
    """Class-aware NMS via the coordinate-offset trick
    (torchvision batched_nms semantics, reference ops.py:310-317)."""
    offs = class_ids.astype(boxes.dtype)[:, None] * (boxes.max() + 1.0)
    return nms(boxes + offs, scores, iou_threshold, max_outputs, score_threshold)


@functools.partial(jax.jit, static_argnames=(
    "score_threshold", "nms_threshold", "nms_top_k", "keep_top_k", "class_agnostic"))
def multiclass_nms(bboxes, scores, score_threshold: float = 0.7,
                   nms_threshold: float = 0.45, nms_top_k: int = 1000,
                   keep_top_k: int = 100, class_agnostic: bool = False):
    """Batched multiclass NMS with static output shapes.

    Args:
      bboxes: [N, A, 4] xyxy.
      scores: [N, A, C] per-class scores.
    Returns:
      dets:  [N, keep_top_k, 6] rows of [label, score, x1, y1, x2, y2]
             (reference tlx_multiclass_nms return layout, ops.py:255-330);
             invalid rows are zero with label -1.
      count: [N] number of valid detections per image.

    Semantics follow the reference's torchvision path: each anchor
    contributes its best class only, then class-aware NMS, then keep_top_k.
    """
    def per_image(boxes, score):
        cls_conf = jnp.max(score, axis=-1)
        cls_id = jnp.argmax(score, axis=-1)
        conf = jnp.where(cls_conf >= score_threshold, cls_conf, NEG_INF)
        # pre-truncate to nms_top_k candidates
        a = boxes.shape[0]
        top = min(nms_top_k, a)
        cand = jnp.argsort(-conf)[:top]
        cboxes, cconf, ccls = boxes[cand], conf[cand], cls_id[cand]
        if class_agnostic:
            keep, mask = nms(cboxes, cconf, nms_threshold, keep_top_k)
        else:
            keep, mask = batched_class_nms(cboxes, cconf, ccls, nms_threshold,
                                           keep_top_k)
        kb = cboxes[keep]
        ks = cconf[keep]
        kc = ccls[keep].astype(boxes.dtype)
        det = jnp.concatenate([kc[:, None], ks[:, None], kb], axis=-1)
        det = jnp.where(mask[:, None], det, jnp.array([-1, 0, 0, 0, 0, 0], boxes.dtype))
        return det, jnp.sum(mask)

    return jax.vmap(per_image)(bboxes, scores)
