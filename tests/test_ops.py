"""Ops-library numerics vs torch/numpy/scipy oracles."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from tlxcv_tpu import ops


# ------------------------------------------------------------ numpy oracles
def np_box_iou(a, b):
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    return inter / (area_a[:, None] + area_b[None, :] - inter)


def np_nms(boxes, scores, thresh):
    """Greedy NMS, torchvision semantics (score-descending keep order)."""
    order = np.argsort(-scores)
    keep, suppressed = [], np.zeros(len(boxes), bool)
    iou = np_box_iou(boxes, boxes)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        suppressed |= iou[i] > thresh
        suppressed[i] = True
    return np.asarray(keep, np.int64)


def np_batched_nms(boxes, scores, cls, thresh):
    off = boxes.max() + 1.0
    return np_nms(boxes + cls[:, None].astype(boxes.dtype) * off, scores, thresh)


def np_giou(a, b):
    iou = np.diag(np_box_iou(a, b))
    x1 = np.minimum(a[:, 0], b[:, 0]); y1 = np.minimum(a[:, 1], b[:, 1])
    x2 = np.maximum(a[:, 2], b[:, 2]); y2 = np.maximum(a[:, 3], b[:, 3])
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    lt = np.maximum(a[:, :2], b[:, :2]); rb = np.minimum(a[:, 2:], b[:, 2:])
    wh = np.clip(rb - lt, 0, None); inter = wh[:, 0] * wh[:, 1]
    union = area_a + area_b - inter
    c = (x2 - x1) * (y2 - y1)
    return iou - (c - union) / c


def random_boxes(rng, n, scale=100.0):
    xy = rng.uniform(0, scale, size=(n, 2))
    wh = rng.uniform(1, scale / 2, size=(n, 2))
    return np.concatenate([xy, xy + wh], -1).astype(np.float32)


# ---------------------------------------------------------------- boxes
def test_pairwise_iou_matches_torchvision(rng):
    a = random_boxes(rng, 13)
    b = random_boxes(rng, 7)
    ref = np_box_iou(a, b)
    out = np.asarray(ops.pairwise_iou(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_aligned_iou_giou(rng):
    a = random_boxes(rng, 9)
    b = random_boxes(rng, 9)
    ref = np_giou(a, b)
    out = np.asarray(ops.aligned_iou(jnp.asarray(a), jnp.asarray(b), mode="giou"))
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_aligned_iou_ordering(rng):
    """diou/ciou <= iou and equal for identical boxes."""
    a = random_boxes(rng, 9)
    ident = np.asarray(ops.aligned_iou(jnp.asarray(a), jnp.asarray(a), mode="ciou"))
    np.testing.assert_allclose(ident, 1.0, atol=1e-4)
    b = random_boxes(rng, 9)
    iou = np.asarray(ops.aligned_iou(jnp.asarray(a), jnp.asarray(b)))
    diou = np.asarray(ops.aligned_iou(jnp.asarray(a), jnp.asarray(b), mode="diou"))
    ciou = np.asarray(ops.aligned_iou(jnp.asarray(a), jnp.asarray(b), mode="ciou"))
    assert np.all(diou <= iou + 1e-6) and np.all(ciou <= diou + 1e-6)


def test_xywh_roundtrip(rng):
    b = random_boxes(rng, 20)
    back = np.asarray(ops.xywh2xyxy(ops.xyxy2xywh(jnp.asarray(b))))
    np.testing.assert_allclose(back, b, atol=1e-4)


def test_delta_roundtrip(rng):
    anchors = random_boxes(rng, 16)
    gt = random_boxes(rng, 16)
    deltas = ops.bbox2delta(jnp.asarray(anchors), jnp.asarray(gt))
    rec = np.asarray(ops.delta2bbox(deltas, jnp.asarray(anchors)))
    np.testing.assert_allclose(rec, gt, atol=1e-2, rtol=1e-3)


def test_delta_encode_finite_for_padded_targets(rng):
    """All-zero (padded) target rows must encode to FINITE deltas —
    log(0) = -inf here NaN'd every masked `loss * pos` reduction in the
    R-CNN family on images with zero valid GTs."""
    anchors = random_boxes(rng, 8)
    gt = np.zeros((8, 4), np.float32)
    deltas = np.asarray(ops.bbox2delta(jnp.asarray(anchors), jnp.asarray(gt)))
    assert np.isfinite(deltas).all()


# ---------------------------------------------------------------- nms
def test_nms_matches_torchvision(rng):
    boxes = random_boxes(rng, 60)
    scores = rng.uniform(0, 1, size=(60,)).astype(np.float32)
    ref = np_nms(boxes, scores, 0.5)
    idx, mask = ops.nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5)
    got = np.asarray(idx)[np.asarray(mask)]
    np.testing.assert_array_equal(got, ref)


def test_nms_max_outputs(rng):
    boxes = random_boxes(rng, 40)
    scores = rng.uniform(0, 1, size=(40,)).astype(np.float32)
    ref = np_nms(boxes, scores, 0.6)
    idx, mask = ops.nms(jnp.asarray(boxes), jnp.asarray(scores), 0.6, max_outputs=5)
    got = np.asarray(idx)[np.asarray(mask)]
    np.testing.assert_array_equal(got, ref[:len(got)])
    assert len(got) <= 5


def test_batched_class_nms_matches_torchvision(rng):
    boxes = random_boxes(rng, 50)
    scores = rng.uniform(0, 1, size=(50,)).astype(np.float32)
    cls = rng.integers(0, 4, size=(50,))
    ref = np_batched_nms(boxes, scores, cls.astype(np.float32), 0.5)
    idx, mask = ops.batched_class_nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(cls), 0.5, 50)
    got = np.asarray(idx)[np.asarray(mask)]
    np.testing.assert_array_equal(got, ref)


def test_multiclass_nms_reference_semantics(rng):
    """Mirror the reference tlx_multiclass_nms torch path (ops.py:255-330)."""
    n, a, c = 2, 80, 5
    boxes = np.stack([random_boxes(rng, a) for _ in range(n)])
    scores = rng.uniform(0, 1, size=(n, a, c)).astype(np.float32)
    dets, counts = ops.multiclass_nms(
        jnp.asarray(boxes), jnp.asarray(scores), score_threshold=0.5,
        nms_threshold=0.45, keep_top_k=20)
    dets, counts = np.asarray(dets), np.asarray(counts)

    for i in range(n):
        conf = scores[i].max(1)
        cls = scores[i].argmax(1)
        m = conf >= 0.5
        keep = np_batched_nms(boxes[i][m], conf[m], cls[m].astype(np.float32), 0.45)
        exp_n = min(len(keep), 20)
        assert counts[i] == exp_n
        got = dets[i][:exp_n]
        exp_scores = conf[m][keep][:exp_n]
        np.testing.assert_allclose(got[:, 1], exp_scores, atol=1e-6)
        np.testing.assert_allclose(got[:, 0], cls[m][keep][:exp_n])
        np.testing.assert_allclose(got[:, 2:], boxes[i][m][keep][:exp_n], atol=1e-4)
        # padding rows zeroed with label -1
        assert np.all(dets[i][exp_n:, 0] == -1)


# ---------------------------------------------------------------- interpolate
@pytest.mark.parametrize("mode,align", [
    ("bilinear", False), ("bilinear", True), ("nearest", False),
])
@pytest.mark.parametrize("size", [(14, 14), (7, 9), (28, 30), (52, 60)])
def test_interpolate_matches_torch(rng, mode, align, size):
    x = rng.normal(size=(2, 4, 13, 15)).astype(np.float32)
    kwargs = {} if mode == "nearest" else {"align_corners": align}
    ref = F.interpolate(torch.tensor(x), size=size, mode=mode, **kwargs).numpy()
    xj = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    out = ops.interpolate(xj, size=size, mode=mode, align_corners=align)
    out = np.transpose(np.asarray(out), (0, 3, 1, 2))
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


# ---------------------------------------------------------------- unpool
def test_max_unpool_roundtrip(rng):
    x = rng.normal(size=(2, 3, 8, 8)).astype(np.float32)
    tx = torch.tensor(x)
    vals_t, idx_t = F.max_pool2d(tx, 2, 2, return_indices=True)
    un_t = F.max_unpool2d(vals_t, idx_t, 2, 2).numpy()

    xj = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    vals, idx = ops.max_pool2d_with_argmax(xj, 2, 2)
    np.testing.assert_allclose(
        np.transpose(np.asarray(vals), (0, 3, 1, 2)), vals_t.numpy(), atol=1e-6)
    un = ops.max_unpool2d(vals, idx, (8, 8))
    np.testing.assert_allclose(
        np.transpose(np.asarray(un), (0, 3, 1, 2)), un_t, atol=1e-6)


# ---------------------------------------------------------------- unfold
def test_unfold_patch_content(rng):
    x = rng.normal(size=(1, 2, 6, 6)).astype(np.float32)
    xj = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    patches, (oh, ow) = ops.unfold(xj, 3, stride=1, padding=1)
    assert patches.shape == (1, 36, 18)
    ref = F.unfold(torch.tensor(x), 3, padding=1).numpy()  # [1, C*9, L]
    # ours is channel-major per patch too (conv_general_dilated_patches) —
    # just differently transposed
    got = np.asarray(patches)[0].T  # [18, 36]
    np.testing.assert_allclose(got, ref[0], atol=1e-6)


# ---------------------------------------------------------------- hungarian
def test_hungarian_callback_matches_scipy(rng):
    from scipy.optimize import linear_sum_assignment

    cost = rng.normal(size=(6, 10)).astype(np.float32)
    r, c = linear_sum_assignment(cost)
    out = np.asarray(ops.hungarian.hungarian_callback(jnp.asarray(cost)))
    np.testing.assert_array_equal(out, c)


def test_auction_assign_near_optimal(rng):
    from scipy.optimize import linear_sum_assignment

    cost = rng.normal(size=(8, 8)).astype(np.float32)
    r, c = linear_sum_assignment(cost)
    opt = cost[r, c].sum()
    assign = np.asarray(ops.hungarian.auction_assign(jnp.asarray(cost), num_iters=500))
    assert len(set(assign.tolist())) == 8, "assignment must be a permutation"
    got = cost[np.arange(8), assign].sum()
    assert got <= opt + 0.1


# ---------------------------------------------------------------- yolo decode
def test_yolo_box_geometry():
    """Decode sanity: zero logits put centers at cell centers, anchor-sized."""
    n, h, w, na, nc = 1, 2, 2, 1, 3
    x = np.zeros((n, h, w, na * (5 + nc)), np.float32)
    x[..., 4] = 10.0  # obj
    img = jnp.asarray([[64, 64]], jnp.int32)
    boxes, scores = ops.yolo_box(jnp.asarray(x), img, [16, 16], nc,
                                 downsample_ratio=32, clip_bbox=False)
    boxes = np.asarray(boxes).reshape(h, w, 4)
    # cell (0,0): center (0.25, 0.25) of image => (16, 16); w = 16/64*64=16
    np.testing.assert_allclose(boxes[0, 0], [16 - 8, 16 - 8, 16 + 8, 16 + 8], atol=1e-4)
    np.testing.assert_allclose(boxes[1, 1], [48 - 8, 48 - 8, 48 + 8, 48 + 8], atol=1e-4)
    assert np.all(np.asarray(scores) > 0.4)


# ---------------------------------------------------------------- ssd priors
def test_ssd_prior_box_structure():
    boxes, var = ops.anchors.ssd_prior_box(
        (2, 2), (100, 100), [30.0], [60.0], aspect_ratios=[2.0], flip=True,
        steps=(50, 50))
    assert boxes.shape == (2, 2, 4, 4)  # 1 + flip-pair + maxsize = 4 priors
    # first prior: ar=1 min_size box at cell center (25, 25), normalized
    np.testing.assert_allclose(
        boxes[0, 0, 0], [(25 - 15) / 100, (25 - 15) / 100,
                         (25 + 15) / 100, (25 + 15) / 100], atol=1e-6)
    s = np.sqrt(30.0 * 60.0) / 2
    np.testing.assert_allclose(
        boxes[0, 0, 3], [(25 - s) / 100, (25 - s) / 100,
                         (25 + s) / 100, (25 + s) / 100], atol=1e-5)
    np.testing.assert_allclose(var[0, 0, 0], [0.1, 0.1, 0.2, 0.2])


def test_wing_loss_piecewise_values():
    """wing(x) = w*ln(1+|x|/eps) inside |x|<w, |x|-C outside, C chosen
    for continuity (Feng et al. CVPR'18)."""
    import numpy as np
    from tlxcv_tpu.ops.losses import wing_loss

    w, eps = 10.0, 2.0
    c = w - w * np.log(1 + w / eps)
    # inside the log region
    x = jnp.asarray([0.0, 1.0, 5.0])
    out = np.asarray(wing_loss(x, jnp.zeros(3), w=w, epsilon=eps,
                               reduction="none"))
    np.testing.assert_allclose(out, w * np.log1p(np.asarray(x) / eps),
                               rtol=1e-6)
    # outside: linear with offset C
    out2 = float(wing_loss(jnp.asarray([25.0]), jnp.zeros(1), w=w,
                           epsilon=eps, reduction="none")[0])
    assert abs(out2 - (25.0 - c)) < 1e-5
    # continuity at |x| = w
    lo = float(wing_loss(jnp.asarray([w - 1e-4]), jnp.zeros(1), w=w,
                         epsilon=eps, reduction="none")[0])
    hi = float(wing_loss(jnp.asarray([w + 1e-4]), jnp.zeros(1), w=w,
                         epsilon=eps, reduction="none")[0])
    assert abs(lo - hi) < 1e-3
    # gradient near zero is ~w/eps (not ~0 like L2) — the reason it
    # fixes the PFLD fine-localization stall
    g = jax.grad(lambda p: wing_loss(p, jnp.zeros(1), w=w, epsilon=eps))(
        jnp.asarray([0.01]))
    assert float(g[0]) > 1.0


def test_rescale_dets_and_cvt_results():
    """Public post-process helpers (reference BBoxPostProcess rescale +
    result conversion, post_process.py:96-130, utils/ops.py:397-406)."""
    # two images: one det at 2x scale, one padded-away row
    dets = jnp.asarray([
        [[1, 0.9, 20, 40, 60, 80], [-1, 0, 0, 0, 0, 0]],
        [[2, 0.8, 10, 10, 30, 30], [0, 0.5, 5, 5, 0, 0]],  # zero-area
    ], jnp.float32)
    counts = jnp.asarray([1, 2])
    scale = jnp.asarray([[2.0, 2.0], [1.0, 1.0]])   # (sy, sx)
    orig = jnp.asarray([[35, 25], [100, 100]])      # (h, w): clips img 0
    out, n = ops.rescale_dets(dets, counts, scale, orig_hw=orig)
    out = np.asarray(out)
    np.testing.assert_allclose(out[0, 0, 2:], [10, 20, 25, 35], atol=1e-5)
    assert list(np.asarray(n)) == [1, 1]            # zero-area dropped
    res = ops.cvt_results(out, n)
    assert len(res) == 2
    assert res[0]["labels"].tolist() == [1]
    assert res[1]["labels"].tolist() == [2]
    np.testing.assert_allclose(res[0]["boxes"][0], [10, 20, 25, 35],
                               atol=1e-5)
