"""COCO-style mAP evaluation, natively in numpy.

Replaces the reference's pycocotools dependency
(reference tlxcv/tasks/human_pose_estimation.py:177-338 CocoEvaluator) —
this container has no pycocotools, and mAP is not in the jit hot path,
so a clean host implementation of the COCO protocol (AP@[.5:.95],
101-point interpolation, maxDets, per-class then mean) serves both
detection and an evaluator facade with the reference's
update/synchronize/accumulate/summarize surface.
"""
from __future__ import annotations

import typing as tp
from collections import defaultdict

import numpy as np

__all__ = ["compute_map", "CocoEvaluator"]

IOU_THRS = np.round(np.arange(0.5, 1.0, 0.05), 2)
RECALL_THRS = np.linspace(0.0, 1.0, 101)


def _iou_matrix(a, b):
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = np.prod(np.clip(a[:, 2:] - a[:, :2], 0, None), -1)
    area_b = np.prod(np.clip(b[:, 2:] - b[:, :2], 0, None), -1)
    return inter / np.maximum(area_a[:, None] + area_b[None] - inter, 1e-9)


def compute_map(predictions, ground_truths, iou_thrs=IOU_THRS, max_dets=100):
    """COCO mAP.

    predictions: list per image of dict(boxes [N,4] xyxy, scores [N],
      labels [N]).
    ground_truths: list per image of dict(boxes [M,4] xyxy, labels [M]).
    Returns dict with 'map' (AP@[.5:.95]), 'map50', 'map75', per-class APs.
    """
    classes = sorted({int(l) for gt in ground_truths
                      for l in np.asarray(gt["labels"]).tolist()})
    ap_per_class = {}
    for cls in classes:
        scores_all, matches_all, n_gt = [], [], 0
        for pred, gt in zip(predictions, ground_truths):
            gt_mask = np.asarray(gt["labels"]) == cls
            gt_boxes = np.asarray(gt["boxes"], np.float32)[gt_mask]
            n_gt += len(gt_boxes)
            p_mask = np.asarray(pred["labels"]) == cls
            p_boxes = np.asarray(pred["boxes"], np.float32)[p_mask]
            p_scores = np.asarray(pred["scores"], np.float32)[p_mask]
            order = np.argsort(-p_scores)[:max_dets]
            p_boxes, p_scores = p_boxes[order], p_scores[order]
            m = np.zeros((len(iou_thrs), len(p_boxes)), bool)
            if len(p_boxes) and len(gt_boxes):
                ious = _iou_matrix(p_boxes, gt_boxes)
                for ti, thr in enumerate(iou_thrs):
                    taken = np.zeros(len(gt_boxes), bool)
                    for pi in range(len(p_boxes)):
                        cand = np.where(~taken & (ious[pi] >= thr))[0]
                        if len(cand):
                            best = cand[np.argmax(ious[pi][cand])]
                            taken[best] = True
                            m[ti, pi] = True
            scores_all.append(p_scores)
            matches_all.append(m)
        if n_gt == 0:
            continue
        scores = np.concatenate(scores_all) if scores_all else np.zeros(0)
        matches = (np.concatenate(matches_all, axis=1) if matches_all
                   else np.zeros((len(iou_thrs), 0), bool))
        order = np.argsort(-scores)
        matches = matches[:, order]
        aps = []
        for ti in range(len(iou_thrs)):
            tp = np.cumsum(matches[ti])
            fp = np.cumsum(~matches[ti])
            recall = tp / n_gt
            precision = tp / np.maximum(tp + fp, 1e-9)
            # precision envelope + 101-point interpolation
            for i in range(len(precision) - 1, 0, -1):
                precision[i - 1] = max(precision[i - 1], precision[i])
            ap = 0.0
            for rt in RECALL_THRS:
                idx = np.searchsorted(recall, rt, side="left")
                ap += precision[idx] if idx < len(precision) else 0.0
            aps.append(ap / len(RECALL_THRS))
        ap_per_class[cls] = np.asarray(aps)

    if not ap_per_class:
        return {"map": 0.0, "map50": 0.0, "map75": 0.0, "per_class": {}}
    all_aps = np.stack(list(ap_per_class.values()))
    i50 = int(np.argmin(np.abs(iou_thrs - 0.5)))
    i75 = int(np.argmin(np.abs(iou_thrs - 0.75)))
    return {
        "map": float(all_aps.mean()),
        "map50": float(all_aps[:, i50].mean()),
        "map75": float(all_aps[:, i75].mean()),
        "per_class": {c: float(v.mean()) for c, v in ap_per_class.items()},
    }


class CocoEvaluator:
    """update/accumulate/summarize facade (reference :177-338)."""

    def __init__(self, iou_types=("bbox",)):
        self.iou_types = iou_types
        self.reset()

    def reset(self):
        self._preds: list = []
        self._gts: list = []
        self.stats: tp.Optional[dict] = None

    def update(self, predictions, ground_truths):
        """Append one batch: lists per image (see compute_map)."""
        self._preds.extend(predictions)
        self._gts.extend(ground_truths)

    def synchronize_between_processes(self):
        # single-process (reference stubbed all_gather the same way :373-374)
        pass

    def accumulate(self):
        self.stats = compute_map(self._preds, self._gts)
        return self.stats

    def summarize(self):
        if self.stats is None:
            self.accumulate()
        s = self.stats
        print(f"AP@[.50:.95] = {s['map']:.4f}  AP@.50 = {s['map50']:.4f}  "
              f"AP@.75 = {s['map75']:.4f}")
        return s
