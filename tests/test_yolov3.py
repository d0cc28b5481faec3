"""YOLOv3 vertical: target assignment vs a numpy re-derivation of the
reference Gt2YoloTarget semantics, loss grads, and the jitted eval path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tlxcv_tpu.core import call_context, pure, split
from tlxcv_tpu.models.detection import YOLOv3, gt2yolo_targets
from tlxcv_tpu.models.detection.yolov3 import DEFAULT_ANCHORS, DEFAULT_MASKS

ANCHORS = DEFAULT_ANCHORS
MASKS = DEFAULT_MASKS
DS = (32, 16, 8)


def np_gt2yolo(gt_boxes, gt_class, gt_score, h, w, num_classes):
    """Literal numpy port of reference Gt2YoloTarget.__call__ semantics
    (yolov3.py:608-672) for a single image, with the repo's documented
    deviation: tx/ty clamped to [0, 1] (round binning can push the
    reference's raw targets outside the BCE range)."""
    an_hw = np.asarray(ANCHORS, np.float32) / np.asarray([[w, h]], np.float32)
    targets = []
    for mask, ds in zip(MASKS, DS):
        gh_, gw_ = round(h / ds), round(w / ds)
        tgt = np.zeros((gh_, gw_, len(mask), 6 + num_classes), np.float32)
        for box, cls, score in zip(gt_boxes, gt_class, gt_score):
            gx, gy, gw, gh = box
            if gw <= 0 or gh <= 0 or score <= 0:
                continue
            ious = []
            for aw, ah in an_hw:
                inter = min(gw, aw) * min(gh, ah)
                ious.append(inter / (gw * gh + aw * ah - inter))
            best = int(np.argmax(ious))
            gi = round(gx * (gw_ - 1))
            gj = round(gy * (gh_ - 1))
            if best in mask:
                n = mask.index(best)
                ax, ay = ANCHORS[best]
                tgt[gj, gi, n, 0] = min(max(gx * gw_ - gi, 0.0), 1.0)
                tgt[gj, gi, n, 1] = min(max(gy * gh_ - gj, 0.0), 1.0)
                tgt[gj, gi, n, 2] = np.log(gw * w / ax)
                tgt[gj, gi, n, 3] = np.log(gh * h / ay)
                tgt[gj, gi, n, 4] = 2.0 - gw * gh
                tgt[gj, gi, n, 5] = score
                tgt[gj, gi, n, 6 + cls] = 1.0
        targets.append(tgt)
    return targets


def test_gt2yolo_matches_reference_semantics(rng):
    h = w = 416
    nc = 6
    m = 8
    boxes = np.zeros((1, m, 4), np.float32)
    n_real = 5
    boxes[0, :n_real, 0:2] = rng.uniform(0.15, 0.85, size=(n_real, 2))
    boxes[0, :n_real, 2:4] = rng.uniform(0.05, 0.5, size=(n_real, 2))
    cls = np.zeros((1, m), np.int32)
    cls[0, :n_real] = rng.integers(0, nc, size=(n_real,))
    score = np.zeros((1, m), np.float32)
    score[0, :n_real] = 1.0

    got = gt2yolo_targets(jnp.asarray(boxes), jnp.asarray(cls),
                          jnp.asarray(score), ANCHORS, MASKS, DS, (h, w), nc)
    exp = np_gt2yolo(boxes[0], cls[0], score[0], h, w, nc)
    for lvl, (g, e) in enumerate(zip(got, exp)):
        np.testing.assert_allclose(np.asarray(g[0]), e, atol=1e-5,
                                   err_msg=f"level {lvl}")


@pytest.fixture(scope="module")
def tiny_yolo():
    return YOLOv3(num_classes=6, keep_top_k=20)


def test_yolov3_train_loss_and_grads(tiny_yolo, rng):
    model = tiny_yolo
    params, state = split(model)
    x = jnp.asarray(rng.normal(size=(2, 128, 128, 3)), jnp.float32)
    boxes = np.zeros((2, 8, 4), np.float32)
    boxes[:, :3, 0:2] = rng.uniform(0.2, 0.8, size=(2, 3, 2))
    boxes[:, :3, 2:4] = rng.uniform(0.1, 0.4, size=(2, 3, 2))
    targets = {
        "boxes": jnp.asarray(boxes),
        "class_labels": jnp.asarray(rng.integers(0, 6, size=(2, 8)), jnp.int32),
    }

    def train_call(m, x, t):
        out = m(x)
        return m.loss_fn(out, t)

    lp = pure(model, train_call)
    loss, _ = jax.jit(lambda p, s: lp(p, s, x, targets, training=True))(params, state)
    assert np.isfinite(float(loss)) and float(loss) > 0

    g = jax.grad(lambda p: lp(p, state, x, targets, training=True)[0])(params)
    gnorm = sum(float(jnp.abs(v).sum()) for v in g.values())
    assert np.isfinite(gnorm) and gnorm > 0


def test_yolov3_eval_path_static_shapes(tiny_yolo, rng):
    model = tiny_yolo
    params, state = split(model)
    fwd = pure(model)
    x = jnp.asarray(rng.normal(size=(2, 128, 128, 3)), jnp.float32)
    (dets, counts), _ = jax.jit(lambda p, s, x: fwd(p, s, x))(params, state, x)
    assert dets.shape == (2, 20, 6)
    assert counts.shape == (2,)
    d = np.asarray(dets)
    valid = d[:, :, 0] >= 0
    if valid.any():
        assert (d[valid][:, 2:4] <= d[valid][:, 4:6] + 1e-3).all()


def test_yolov3_iou_aware_branch(rng):
    """iou_aware=True: extra na channels per level, eval recombination
    changes scores, training loss includes the IoU-prediction term
    (reference yolov3.py:281,:355-376 — VERDICT r1 missing #7)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tlxcv_tpu.core import Rngs, pure, split
    from tlxcv_tpu.models.detection import YOLOv3

    model = YOLOv3(num_classes=3, iou_aware=True)
    params, state = split(model)
    x = jnp.asarray(rng.normal(size=(1, 96, 96, 3)), jnp.float32)

    # head emits na*(5+nc) + na channels
    outs, _ = pure(model, lambda m, v: m.head_outputs(v))(params, state, x)
    na = 3
    assert outs[0].shape[-1] == na * (5 + 3) + na

    # eval path runs through the recombination
    (dets, counts), _ = pure(model)(params, state, x, training=False)
    assert dets.shape[-1] == 6
    assert np.isfinite(np.asarray(dets)).all()

    # training loss finite + ioup receives gradient
    boxes = np.zeros((1, 2, 4), np.float32)
    boxes[:, 0] = [0.5, 0.5, 0.3, 0.3]
    targets = {"boxes": jnp.asarray(boxes),
               "class_labels": jnp.zeros((1, 2), jnp.int32)}
    lp = pure(model, lambda m, v, t: m.loss_fn(m(v), t))

    def lf(p):
        loss, _ = lp(p, state, x, targets, training=True,
                     rngs=Rngs(jax.random.key(0)))
        return loss

    loss, grads = jax.value_and_grad(lf)(params)
    assert np.isfinite(float(loss))
    head_grads = [np.abs(np.asarray(v)).max()
                  for k, v in grads.items() if "yolo_outputs" in k]
    assert max(head_grads) > 0


def test_gt2yolo_duplicate_slot_is_deterministic_later_wins():
    """Two GTs sharing (cell, best anchor): the scan stamps the LATER GT
    (the reference's sequential loop semantics) — a one-shot scatter
    with duplicate indices is unspecified in XLA."""
    h = w = 416
    nc = 3
    boxes = np.zeros((1, 4, 4), np.float32)
    # identical centers and wh -> same cell, same best anchor
    boxes[0, 0] = [0.5, 0.5, 0.2, 0.3]
    boxes[0, 1] = [0.5, 0.5, 0.2, 0.3]
    cls = np.zeros((1, 4), np.int32)
    cls[0, 0], cls[0, 1] = 1, 2
    score = np.zeros((1, 4), np.float32)
    score[0, :2] = 1.0
    got = gt2yolo_targets(jnp.asarray(boxes), jnp.asarray(cls),
                          jnp.asarray(score), ANCHORS, MASKS, DS,
                          (h, w), nc)
    stamped = [np.asarray(g[0]) for g in got]
    # exactly one slot stamped, with GT 1's class (later wins)
    total_obj = sum((t[..., 5] > 0).sum() for t in stamped)
    assert total_obj == 1, total_obj
    for t in stamped:
        pos = np.argwhere(t[..., 5] > 0)
        for gj, gi, n in pos:
            assert t[gj, gi, n, 6 + 2] == 1.0  # class of the LATER GT
            assert t[gj, gi, n, 6 + 1] == 0.0


def test_gt2yolo_iou_thresh_extra_anchor_positives():
    """iou_thresh < 1 stamps additional same-level anchors above the
    wh-IoU threshold (reference yolov3.py:654-670)."""
    h = w = 416
    nc = 3
    boxes = np.zeros((1, 2, 4), np.float32)
    boxes[0, 0] = [0.5, 0.5, 0.25, 0.28]
    cls = np.zeros((1, 2), np.int32)
    score = np.zeros((1, 2), np.float32)
    score[0, 0] = 1.0
    base = gt2yolo_targets(jnp.asarray(boxes), jnp.asarray(cls),
                           jnp.asarray(score), ANCHORS, MASKS, DS,
                           (h, w), nc)
    multi = gt2yolo_targets(jnp.asarray(boxes), jnp.asarray(cls),
                            jnp.asarray(score), ANCHORS, MASKS, DS,
                            (h, w), nc, iou_thresh=0.2)
    n_base = sum(int((np.asarray(t)[..., 5] > 0).sum()) for t in base)
    n_multi = sum(int((np.asarray(t)[..., 5] > 0).sum()) for t in multi)
    assert n_base == 1
    assert n_multi > n_base, (n_base, n_multi)
    # the best-anchor stamp is unchanged
    for tb, tm in zip(base, multi):
        tb, tm = np.asarray(tb), np.asarray(tm)
        mask = tb[..., 5] > 0
        np.testing.assert_allclose(tm[mask], tb[mask], atol=1e-6)
