"""Fixed-capacity, padded non-maximum suppression for TPU.

Replaces the reference's native-NMS escapes
(reference tlxcv/models/detection/utils/ops.py:126-330 →
paddle._C_ops.multiclass_nms3 / torchvision.ops.batched_nms) with
static-shape JAX: every output is a fixed-size tensor plus a validity
count, so the whole predict path stays inside one jit (SURVEY.md §7
hard part #1).

Algorithm: K-step `lax.scan` (K = max_outputs); each step takes the
current argmax, emits it, and suppresses its overlaps — O(K·A) vector
work with only K sequential steps (not A), which is what makes NMS cheap
on TPU when A is in the thousands but K is ~100.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["nms", "batched_class_nms", "multiclass_nms", "matrix_nms"]

NEG_INF = -1e9


def _iou_one_vs_all(box, boxes):
    lt = jnp.maximum(box[:2], boxes[:, :2])
    rb = jnp.minimum(box[2:], boxes[:, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[:, 0] * wh[:, 1]
    area = jnp.maximum(box[2] - box[0], 0) * jnp.maximum(box[3] - box[1], 0)
    areas = (jnp.maximum(boxes[:, 2] - boxes[:, 0], 0) *
             jnp.maximum(boxes[:, 3] - boxes[:, 1], 0))
    return inter / (area + areas - inter + 1e-9)


def nms(boxes, scores, iou_threshold: float = 0.5, max_outputs: int | None = None,
        score_threshold: float | None = None):
    """Single-class greedy NMS over ``boxes [A, 4]`` / ``scores [A]``.

    Returns ``(keep_idx [K], keep_mask [K])`` with K = max_outputs (or A);
    kept indices are score-descending (torchvision.ops.nms order).
    """
    num = boxes.shape[0]
    k = num if max_outputs is None else min(max_outputs, num)
    work = scores.astype(jnp.float32)
    if score_threshold is not None:
        work = jnp.where(scores >= score_threshold, work, NEG_INF)

    def step(work, _):
        idx = jnp.argmax(work)
        best = work[idx]
        keep = best > NEG_INF / 2
        iou_row = _iou_one_vs_all(boxes[idx], boxes)
        suppress = keep & (iou_row > iou_threshold)
        work = jnp.where(suppress, NEG_INF, work)
        work = work.at[idx].set(NEG_INF)
        return work, (idx.astype(jnp.int32), keep)

    _, (idxs, keeps) = lax.scan(step, work, None, length=k)
    return idxs, keeps


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
        conf = jnp.where(cls_conf >= score_threshold,
                         cls_conf.astype(jnp.float32), NEG_INF)
        # pre-truncate to nms_top_k candidates
        a = boxes.shape[0]
        top = min(nms_top_k, a)
        if top < a:
            cand = jax.lax.top_k(conf, top)[1]
        else:
            cand = jnp.argsort(-conf)
        cboxes, cconf, ccls = boxes[cand], conf[cand], cls_id[cand]
        if class_agnostic:
            keep, mask = nms(cboxes, cconf, nms_threshold, keep_top_k)
        else:
            keep, mask = batched_class_nms(cboxes, cconf, ccls, nms_threshold,
                                           keep_top_k)
        kb = cboxes[keep]
        ks = cconf[keep]
        kc = ccls[keep].astype(boxes.dtype)
        det = jnp.concatenate([kc[:, None], ks[:, None].astype(boxes.dtype),
                               kb], axis=-1)
        det = jnp.where(mask[:, None], det,
                        jnp.array([-1, 0, 0, 0, 0, 0], boxes.dtype))
        return det, jnp.sum(mask)

    return jax.vmap(per_image)(bboxes, scores)


@functools.partial(jax.jit, static_argnames=("keep_top_k", "use_gaussian",
                                              "pre_top_k"))
def matrix_nms(bboxes, scores, score_threshold: float = 0.05,
               keep_top_k: int = 100, use_gaussian: bool = False,
               gaussian_sigma: float = 2.0, pre_top_k: int = 512):
    """Matrix NMS (SOLOv2-style): fully parallel score decay, no loop.

    A faster approximate alternative to greedy NMS for throughput-bound
    serving.  bboxes [N, A, 4], scores [N, A, C] -> same output layout as
    :func:`multiclass_nms`.  Candidates pre-truncated to `pre_top_k` by
    best-class score so the pairwise IoU stays small.
    """
    def per_image(boxes, score):
        conf = jnp.max(score, axis=-1)
        cls_id = jnp.argmax(score, axis=-1)
        conf = jnp.where(conf >= score_threshold,
                         conf.astype(jnp.float32), 0.0)
        top = min(pre_top_k, boxes.shape[0])
        conf, cand = jax.lax.top_k(conf, top)
        boxes = boxes[cand]
        cls_id = cls_id[cand]
        # same-class pairwise IoU of higher-scored boxes
        from .boxes import pairwise_iou

        iou = pairwise_iou(boxes, boxes)
        same = cls_id[:, None] == cls_id[None, :]
        # conf is already sorted by top_k, so index order breaks score
        # ties (SOLOv2's triu(diagonal=1) semantics) — with a strict <
        # alone, two bit-identical scores never decayed each other and
        # duplicate boxes both survived at full score
        rank = jnp.arange(conf.shape[0])
        higher = (conf[:, None] < conf[None, :]) | (
            (conf[:, None] == conf[None, :]) & (rank[:, None] > rank[None, :]))
        decay_iou = jnp.where(same & higher, iou, 0.0)
        max_decay = decay_iou.max(axis=1)
        if use_gaussian:
            decay = jnp.exp(-(max_decay ** 2) / gaussian_sigma)
        else:
            decay = (1.0 - max_decay)
        decayed = conf * decay
        top_s, top_i = jax.lax.top_k(decayed, min(keep_top_k, top))
        det = jnp.concatenate([
            cls_id[top_i][:, None].astype(boxes.dtype),
            top_s[:, None].astype(boxes.dtype), boxes[top_i]], -1)
        valid = top_s > 0
        det = jnp.where(valid[:, None], det,
                        jnp.array([-1, 0, 0, 0, 0, 0], boxes.dtype))
        return det, valid.sum()

    return jax.vmap(per_image)(bboxes, scores)
