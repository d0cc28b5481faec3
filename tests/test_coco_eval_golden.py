"""Analytic golden values for the native COCO evaluator.

pycocotools is not in this environment, so instead of pinned fixtures
these cases are chosen so the COCO protocol's answer is hand-derivable
(101-point interpolation over recall in [0,1], AP averaged over the 10
IoU thresholds .50:.05:.95, greedy best-IoU matching per threshold).
Each expected number below is computed in the comment above it.
"""
import numpy as np
import pytest

from tlxcv_tpu.utils.coco_eval import (CocoEvaluator, compute_coco_stats,
                                       compute_map)


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
    ev = CocoEvaluator(full_protocol=False)
    ev.update(preds[:2], gts[:2])
    ev.update(preds[2:], gts[2:])
    ev.synchronize_between_processes()
    stats = ev.summarize()
    assert stats == compute_map(preds, gts)
    # the full-protocol engine's headline AP must agree with the facade
    full = compute_coco_stats(preds, gts)
    assert full["map"] == pytest.approx(stats["map"])
    assert full["map50"] == pytest.approx(stats["map50"])


# ---------------------------------------------------------------------------
# Full-protocol analytic cases (iscrowd / area ranges / AR / segm / OKS)
# ---------------------------------------------------------------------------

def test_iscrowd_gt_is_ignored_not_counted():
    # Image has one crowd GT and one normal GT.  Pred 1 hits the crowd
    # region (perfect IoU) -> must be IGNORED (neither TP nor FP); pred 2
    # hits the normal GT -> TP.  npig = 1, so AP = 1.0 exactly; without
    # crowd semantics pred 1 would be an FP at rank 1 and AP would be .5.
    gt = [{"boxes": np.array([[0, 0, 10, 10], [50, 50, 60, 60]], np.float32),
           "labels": np.array([1, 1]),
           "iscrowd": np.array([1, 0])}]
    pred = [_img([[0, 0, 10, 10], [50, 50, 60, 60]], [1, 1], [0.9, 0.8])]
    s = compute_coco_stats(pred, gt)
    assert s["map"] == pytest.approx(1.0)


def test_iscrowd_iou_uses_det_area():
    # Crowd IoU = inter / det_area.  Det [0,0,10,10] inside crowd
    # [0,0,100,100]: inter = 100 = det area -> crowd IoU 1.0 -> matched
    # and ignored at every threshold.  One normal GT fully detected.
    gt = [{"boxes": np.array([[0, 0, 100, 100], [200, 0, 220, 20]],
                             np.float32),
           "labels": np.array([1, 1]), "iscrowd": np.array([1, 0])}]
    pred = [_img([[0, 0, 10, 10], [200, 0, 220, 20]], [1, 1], [0.95, 0.9])]
    s = compute_coco_stats(pred, gt)
    assert s["map"] == pytest.approx(1.0)


def test_area_range_stats():
    # One small GT (10x10 = 100 < 32^2) and one large GT (200x200 = 4e4
    # > 96^2), both perfectly detected.  AP(small) = AP(large) = 1,
    # AP(medium) has no GT -> -1 in the stat vector.
    gt = [_img([[0, 0, 10, 10], [300, 300, 500, 500]], [1, 1])]
    pred = [_img([[0, 0, 10, 10], [300, 300, 500, 500]], [1, 1],
                 [0.9, 0.8])]
    s = compute_coco_stats(pred, gt)
    stats = s["stats"]
    assert stats[0] == pytest.approx(1.0)   # AP all
    assert stats[3] == pytest.approx(1.0)   # AP small
    assert stats[4] == pytest.approx(-1.0)  # AP medium: no GT
    assert stats[5] == pytest.approx(1.0)   # AP large
    assert stats[9] == pytest.approx(1.0)   # AR small
    assert stats[11] == pytest.approx(1.0)  # AR large


def test_out_of_range_unmatched_det_is_ignored():
    # In the small-area bin, a large unmatched detection must be ignored
    # (not an FP): small GT detected perfectly at rank 2, large spurious
    # det at rank 1.  AP(small) = 1.0; in the "all" bin the large det IS
    # an FP at rank 1 -> AP(all) = 0.5.
    gt = [_img([[0, 0, 10, 10]], [1])]
    pred = [_img([[300, 300, 500, 500], [0, 0, 10, 10]], [1, 1],
                 [0.9, 0.8])]
    s = compute_coco_stats(pred, gt)
    assert s["stats"][3] == pytest.approx(1.0)  # AP small
    assert s["stats"][0] == pytest.approx(0.5)  # AP all


def test_ar_maxdet_tiers():
    # 3 GTs; dets ranked: GT-A hit, junk, junk, GT-B hit (scores desc).
    # AR@1: only top-1 det -> 1/3 recall.  AR@10/100: 2/3.
    gt = [_img([[0, 0, 10, 10], [50, 50, 60, 60], [100, 100, 110, 110]],
               [1, 1, 1])]
    pred = [_img([[0, 0, 10, 10], [200, 0, 210, 10], [0, 200, 10, 210],
                  [50, 50, 60, 60]], [1, 1, 1, 1], [0.9, 0.8, 0.7, 0.6])]
    s = compute_coco_stats(pred, gt)
    assert s["stats"][6] == pytest.approx(1 / 3)  # AR@1
    assert s["stats"][7] == pytest.approx(2 / 3)  # AR@10
    assert s["stats"][8] == pytest.approx(2 / 3)  # AR@100


def _disk_mask(h, w, cy, cx, r):
    yy, xx = np.mgrid[0:h, 0:w]
    return ((yy - cy) ** 2 + (xx - cx) ** 2) <= r * r


def test_segm_mask_iou_perfect_and_half():
    # Perfect mask -> AP 1.  Half-overlap square masks: pred 16x32 strip
    # vs gt 32x32 square -> IoU = 512/1024 = .5 -> TP only at thr .50
    # (10 thresholds -> AP = 1/10 for that class).
    h = w = 64
    m_gt = np.zeros((h, w), bool); m_gt[0:32, 0:32] = True
    m_pr = np.zeros((h, w), bool); m_pr[0:16, 0:32] = True
    gt = [{"boxes": np.array([[0, 0, 32, 32]], np.float32),
           "labels": np.array([1]), "masks": m_gt[None]},
          {"boxes": np.array([[0, 0, 32, 32]], np.float32),
           "labels": np.array([2]), "masks": m_gt[None]}]
    pred = [{"boxes": np.array([[0, 0, 32, 32]], np.float32),
             "labels": np.array([1]), "scores": np.array([0.9]),
             "masks": m_gt[None]},
            {"boxes": np.array([[0, 0, 32, 32]], np.float32),
             "labels": np.array([2]), "scores": np.array([0.9]),
             "masks": m_pr[None]}]
    s = compute_coco_stats(pred, gt, iou_type="segm")
    assert s["per_class"][1] == pytest.approx(1.0)
    assert s["per_class"][2] == pytest.approx(0.1)


def test_segm_area_from_mask_not_box():
    # A thin diagonal-ish mask inside a big box: segm area ranges must
    # classify by MASK area (pixel count), not box area.  Mask = 20x4
    # strip = 80 px < 32^2 -> small bin, though its box is 100x100.
    h = w = 128
    m = np.zeros((h, w), bool); m[10:30, 10:14] = True
    gt = [{"boxes": np.array([[0, 0, 100, 100]], np.float32),
           "labels": np.array([1]), "masks": m[None]}]
    pred = [{"boxes": np.array([[0, 0, 100, 100]], np.float32),
             "labels": np.array([1]), "scores": np.array([0.9]),
             "masks": m[None]}]
    s = compute_coco_stats(pred, gt, iou_type="segm")
    assert s["stats"][3] == pytest.approx(1.0)   # AP small
    assert s["stats"][5] == pytest.approx(-1.0)  # AP large: no GT there


def test_oks_perfect_keypoints():
    from tlxcv_tpu.utils.coco_eval import COCO_KPT_SIGMAS
    K = 17
    kp = np.zeros((1, K, 3), np.float32)
    kp[0, :, 0] = np.linspace(10, 50, K)
    kp[0, :, 1] = np.linspace(10, 50, K)
    kp[0, :, 2] = 2  # visible
    gt = [{"boxes": np.array([[0, 0, 64, 64]], np.float32),
           "labels": np.array([1]), "keypoints": kp,
           "area": np.array([64.0 * 64.0])}]
    pred = [{"boxes": np.array([[0, 0, 64, 64]], np.float32),
             "labels": np.array([1]), "scores": np.array([0.9]),
             "keypoints": kp}]
    s = compute_coco_stats(pred, gt, iou_type="keypoints")
    assert s["map"] == pytest.approx(1.0)
    assert len(s["stats"]) == 10


def test_oks_known_offset_value():
    # Single visible keypoint (sigma_0 = .026): OKS = exp(-d^2 /
    # (2 * area * (2*sigma)^2)).  Choose d so OKS lands between .50 and
    # .55 -> TP at thr .50 only -> AP = 1/10.
    from tlxcv_tpu.utils.coco_eval import COCO_KPT_SIGMAS
    K = 17
    area = 64.0 * 64.0
    var = (2 * float(COCO_KPT_SIGMAS[0])) ** 2
    # want exp(-d2/(2*area*var)) = .52 -> d2 = -ln(.52)*2*area*var
    d2 = -np.log(0.52) * 2 * area * var
    d = float(np.sqrt(d2))
    gt_kp = np.zeros((1, K, 3), np.float32)
    gt_kp[0, 0] = [32, 32, 2]
    pr_kp = np.zeros((1, K, 3), np.float32)
    pr_kp[0, 0] = [32 + d, 32, 1]
    gt = [{"boxes": np.array([[0, 0, 64, 64]], np.float32),
           "labels": np.array([1]), "keypoints": gt_kp,
           "area": np.array([area])}]
    pred = [{"boxes": np.array([[0, 0, 64, 64]], np.float32),
             "labels": np.array([1]), "scores": np.array([0.9]),
             "keypoints": pr_kp}]
    s = compute_coco_stats(pred, gt, iou_type="keypoints")
    assert s["map50"] == pytest.approx(1.0)
    assert s["map"] == pytest.approx(0.1)


def test_keypoints_zero_visible_gt_ignored():
    # GT with no labelled keypoints is ignored entirely: a det matching
    # nothing visible isn't penalized, and npig excludes that GT.
    K = 17
    gt_kp = np.zeros((2, K, 3), np.float32)
    gt_kp[0, :, :2] = 20; gt_kp[0, :, 2] = 2
    # gt 2: zero visibility
    pr_kp = np.zeros((2, K, 3), np.float32)
    pr_kp[0, :, :2] = 20; pr_kp[0, :, 2] = 1
    pr_kp[1, :, :2] = 200; pr_kp[1, :, 2] = 1
    gt = [{"boxes": np.array([[0, 0, 40, 40], [180, 180, 220, 220]],
                             np.float32),
           "labels": np.array([1, 1]), "keypoints": gt_kp,
           "area": np.array([1600.0, 1600.0])}]
    pred = [{"boxes": np.array([[0, 0, 40, 40], [180, 180, 220, 220]],
                               np.float32),
             "labels": np.array([1, 1]), "scores": np.array([0.9, 0.8]),
             "keypoints": pr_kp}]
    s = compute_coco_stats(pred, gt, iou_type="keypoints")
    # det 2 matches the ignored GT region (z-box) -> ignored, AP = 1.0
    assert s["map"] == pytest.approx(1.0)


def test_multi_type_evaluator_facade():
    m = np.zeros((64, 64), bool); m[0:10, 0:10] = True
    gt = [{"boxes": np.array([[0, 0, 10, 10]], np.float32),
           "labels": np.array([1]), "masks": m[None]}]
    pred = [{"boxes": np.array([[0, 0, 10, 10]], np.float32),
             "labels": np.array([1]), "scores": np.array([0.9]),
             "masks": m[None]}]
    ev = CocoEvaluator(iou_types=("bbox", "segm"))
    ev.update(pred, gt)
    stats = ev.summarize()
    assert stats["bbox"]["map"] == pytest.approx(1.0)
    assert stats["segm"]["map"] == pytest.approx(1.0)
    assert len(stats["bbox"]["stats"]) == 12


def test_segm_zero_detection_image():
    """An image with zero detections must not crash the segm path
    (numpy reshape(0, -1) pitfall) and counts its GT as a miss."""
    m = np.zeros((64, 64), bool); m[0:10, 0:10] = True
    gt = [{"boxes": np.array([[0, 0, 10, 10]], np.float32),
           "labels": np.array([1]), "masks": m[None]},
          {"boxes": np.array([[0, 0, 10, 10]], np.float32),
           "labels": np.array([1]), "masks": m[None]}]
    pred = [{"boxes": np.zeros((0, 4), np.float32),
             "labels": np.zeros((0,), np.int64),
             "scores": np.zeros((0,), np.float32),
             "masks": np.zeros((0, 64, 64), bool)},
            {"boxes": np.array([[0, 0, 10, 10]], np.float32),
             "labels": np.array([1]), "scores": np.array([0.9]),
             "masks": m[None]}]
    s = compute_coco_stats(pred, gt, iou_type="segm")
    # 1 of 2 GTs found at precision 1 -> AP = 51/101
    assert s["map"] == pytest.approx(51 / 101)
