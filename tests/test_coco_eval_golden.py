"""Analytic golden values for the native COCO evaluator.

pycocotools is not in this environment, so instead of pinned fixtures
these cases are chosen so the COCO protocol's answer is hand-derivable
(101-point interpolation over recall in [0,1], AP averaged over the 10
IoU thresholds .50:.05:.95, greedy best-IoU matching per threshold).
Each expected number below is computed in the comment above it.
"""
import numpy as np
import pytest

from tlxcv_tpu.utils.coco_eval import CocoEvaluator, compute_map


def _img(boxes, labels, scores=None):
    d = {"boxes": np.asarray(boxes, np.float32),
         "labels": np.asarray(labels, np.int64)}
    if scores is not None:
        d["scores"] = np.asarray(scores, np.float32)
    return d


def test_perfect_single_detection():
    # exact-match pred: TP at every threshold -> AP = 1 everywhere
    pred = [_img([[0, 0, 10, 10]], [1], [0.9])]
    gt = [_img([[0, 0, 10, 10]], [1])]
    s = compute_map(pred, gt)
    assert s["map"] == pytest.approx(1.0)
    assert s["map50"] == pytest.approx(1.0)
    assert s["map75"] == pytest.approx(1.0)


def test_high_scored_false_positive_halves_precision():
    # rank1 = FP (IoU 0), rank2 = TP (IoU 1).  cumTP=[0,1] cumFP=[1,1]
    # -> recall [0,1], precision [0, .5]; envelope [.5,.5]; every one of
    # the 101 recall points reads 0.5 -> AP = 0.5 at all thresholds.
    pred = [_img([[50, 50, 60, 60], [0, 0, 10, 10]], [1, 1], [0.9, 0.8])]
    gt = [_img([[0, 0, 10, 10]], [1])]
    s = compute_map(pred, gt)
    assert s["map"] == pytest.approx(0.5)
    assert s["map50"] == pytest.approx(0.5)


def test_iou_threshold_cutoff():
    # pred [0,0,10,6] vs gt [0,0,10,10]: inter 60, union 100 -> IoU .6
    # -> TP for thr in {.50,.55,.60} (3 of 10), FP above
    # -> map50 = 1, map75 = 0, map = 3/10.
    pred = [_img([[0, 0, 10, 6]], [1], [0.9])]
    gt = [_img([[0, 0, 10, 10]], [1])]
    s = compute_map(pred, gt)
    assert s["map50"] == pytest.approx(1.0)
    assert s["map75"] == pytest.approx(0.0)
    assert s["map"] == pytest.approx(0.3)


def test_per_class_mean():
    # class 1 perfect (AP 1), class 2 entirely missed (AP 0) -> map .5
    pred = [_img([[0, 0, 10, 10]], [1], [0.9])]
    gt = [_img([[0, 0, 10, 10], [20, 20, 30, 30]], [1, 2])]
    s = compute_map(pred, gt)
    assert s["per_class"][1] == pytest.approx(1.0)
    assert s["per_class"][2] == pytest.approx(0.0)
    assert s["map"] == pytest.approx(0.5)


def test_partial_recall_interpolation_grid():
    # 2 GTs, 1 perfect pred: recall plateaus at 0.5 with precision 1.
    # 101-point rule: recall points 0.00..0.50 inclusive (51 of 101)
    # read precision 1, the rest 0 -> AP = 51/101.
    pred = [_img([[0, 0, 10, 10]], [1], [0.9])]
    gt = [_img([[0, 0, 10, 10], [40, 40, 50, 50]], [1, 1])]
    s = compute_map(pred, gt)
    assert s["map"] == pytest.approx(51 / 101)
    assert s["map50"] == pytest.approx(51 / 101)


def test_greedy_matching_takes_best_iou_first():
    # one GT, two preds overlapping it; higher-scored pred has the
    # smaller IoU (.6), lower-scored has IoU 1.  At thr=.5 the first
    # (rank-1) pred takes the GT: TP then FP -> envelope precision 1 up
    # to recall 1 -> AP@.50 = 1.  At thr=.75 rank-1 is FP, rank-2 TP
    # -> precision [0,.5] -> AP@.75 = .5.
    pred = [_img([[0, 0, 10, 6], [0, 0, 10, 10]], [1, 1], [0.9, 0.8])]
    gt = [_img([[0, 0, 10, 10]], [1])]
    s = compute_map(pred, gt)
    assert s["map50"] == pytest.approx(1.0)
    assert s["map75"] == pytest.approx(0.5)


def test_max_dets_cap():
    # 1 GT and 150 preds; the TP is ranked last (score lowest).  With
    # max_dets=100 it is cut -> AP 0; with max_dets=200 it survives.
    fps = [[i * 20 + 1000, 0, i * 20 + 1010, 10] for i in range(149)]
    boxes = fps + [[0, 0, 10, 10]]
    scores = list(np.linspace(0.9, 0.5, 149)) + [0.1]
    pred = [_img(boxes, [1] * 150, scores)]
    gt = [_img([[0, 0, 10, 10]], [1])]
    assert compute_map(pred, gt, max_dets=100)["map"] == pytest.approx(0.0)
    assert compute_map(pred, gt, max_dets=200)["map"] > 0.0


def test_evaluator_facade_matches_compute_map():
    rng = np.random.default_rng(0)
    preds, gts = [], []
    for _ in range(4):
        gt_boxes = rng.uniform(0, 80, size=(3, 2))
        gt_boxes = np.concatenate([gt_boxes, gt_boxes + 20], -1)
        gts.append(_img(gt_boxes, rng.integers(1, 3, size=3)))
        jitter = gt_boxes + rng.normal(0, 2, gt_boxes.shape)
        preds.append(_img(jitter, rng.integers(1, 3, size=3),
                          rng.uniform(0.5, 1, size=3)))
    ev = CocoEvaluator()
    ev.update(preds[:2], gts[:2])
    ev.update(preds[2:], gts[2:])
    ev.synchronize_between_processes()
    stats = ev.summarize()
    assert stats == compute_map(preds, gts)
