"""PPYOLOE: assigners, loss (both phases), eval path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tlxcv_tpu.core import pure, split
from tlxcv_tpu.models.detection.ppyoloe import (ppyoloe, task_aligned_assign,
                                                atss_assign,
                                                check_points_inside)


def test_check_points_inside():
    pts = jnp.asarray([[5.0, 5.0], [50.0, 50.0]])
    boxes = jnp.asarray([[[0.0, 0.0, 10.0, 10.0]]])  # [1, 1, 4]
    out = np.asarray(check_points_inside(pts, boxes))
    assert out.shape == (1, 1, 2)
    assert out[0, 0, 0] == 1.0 and out[0, 0, 1] == 0.0


def test_task_aligned_assign_prefers_good_anchor(rng):
    a, nc = 12, 3
    points = jnp.asarray(
        np.stack([np.linspace(4, 92, a), np.full(a, 50.0)], -1), jnp.float32)
    gt = jnp.asarray([[[30.0, 30.0, 70.0, 70.0]]])  # one box center (50,50)
    labels = jnp.asarray([[1]], jnp.int32)
    pad = jnp.ones((1, 1, a))
    # predicted boxes: anchor-centered squares
    pb = jnp.concatenate([points - 20, points + 20], -1)[None]
    scores = jnp.full((1, a, nc), 0.5)
    lab, bbox, sc = task_aligned_assign(scores, pb, points, labels, gt, pad,
                                        bg_index=nc, num_classes=nc, topk=4)
    lab = np.asarray(lab)[0]
    # anchors near the center must be positive with class 1, far ones bg
    assert (lab[5:7] == 1).all()
    assert (lab[:2] == nc).all() and (lab[-2:] == nc).all()
    assert np.asarray(sc).max() > 0


def test_atss_assign_basic(rng):
    a, nc = 16, 3
    centers = np.stack([np.linspace(4, 124, a), np.full(a, 64.0)], -1)
    anchors = np.concatenate([centers - 8, centers + 8], -1).astype(np.float32)
    gt = jnp.asarray([[[48.0, 48.0, 80.0, 80.0]]])
    labels = jnp.asarray([[2]], jnp.int32)
    pad = jnp.ones((1, 1, a))
    lab, bbox, sc = atss_assign(anchors, [a], labels, gt, pad, bg_index=nc,
                                num_classes=nc, topk=4)
    lab = np.asarray(lab)[0]
    assert (lab == 2).sum() >= 1
    pos = lab == 2
    np.testing.assert_allclose(
        np.asarray(bbox)[0][pos],
        np.broadcast_to(np.asarray(gt)[0, 0], (int(pos.sum()), 4)), atol=1e-5)


@pytest.fixture(scope="module")
def tiny_ppyoloe():
    return ppyoloe("ppyoloe_s", num_classes=4,
                   nms_cfg=dict(score_threshold=0.01, nms_threshold=0.6,
                                nms_top_k=200, keep_top_k=10))


def test_ppyoloe_loss_both_phases(tiny_ppyoloe, rng):
    model = tiny_ppyoloe
    params, state = split(model)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
    boxes = np.zeros((2, 4, 4), np.float32)
    boxes[:, :2, :2] = rng.uniform(5, 25, size=(2, 2, 2))
    boxes[:, :2, 2:] = boxes[:, :2, :2] + rng.uniform(10, 30, size=(2, 2, 2))
    targets = {"boxes": jnp.asarray(boxes),
               "class_labels": jnp.asarray(rng.integers(0, 4, size=(2, 4)),
                                           jnp.int32)}

    for epoch in (0, 100):  # static ATSS phase, then TaskAligned phase
        def call(m, x, t):
            out = m(x, epoch_id=epoch)
            return m.loss_fn(out, t)

        lp = pure(model, call)
        loss, _ = jax.jit(lambda p, s: lp(p, s, x, targets, training=True))(
            params, state)
        assert np.isfinite(float(loss)), f"epoch {epoch}"
        g = jax.grad(lambda p: lp(p, state, x, targets, training=True)[0])(params)
        gn = sum(float(jnp.abs(v).sum()) for v in g.values())
        assert np.isfinite(gn) and gn > 0, f"epoch {epoch}"


def test_ppyoloe_eval(tiny_ppyoloe, rng):
    model = tiny_ppyoloe
    params, state = split(model)
    fwd = pure(model)
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)), jnp.float32)
    (dets, counts), _ = jax.jit(lambda p, s, x: fwd(p, s, x))(params, state, x)
    assert dets.shape == (1, 10, 6) and counts.shape == (1,)


def test_task_aligned_assign_cold_start_keeps_positives(rng):
    """Reference gather_topk_anchors(:1700) is called with
    topk_mask=pad_gt_mask: every real gt keeps its top-k candidates
    regardless of metric MAGNITUDE.  A `metric > eps` cutoff silently
    drops all positives once cls*iou^6 underflows 1e-9 (score 1e-3,
    iou 0.1) — the r4 two-phase sweep collapsed to loss 5e-4 / mAP 0.0
    exactly this way."""
    b, m, a, c = 2, 8, 100, 3
    pts = jnp.asarray(rng.uniform(0, 128, (a, 2)), jnp.float32)
    raw = np.sort(rng.uniform(0, 128, (b, 3, 2, 2)), axis=2).reshape(b, 3, 4)
    raw[..., 2:] = raw[..., :2] + np.maximum(raw[..., 2:] - raw[..., :2], 30)
    gt = np.zeros((b, m, 4), np.float32)
    gt[:, :3] = raw
    labels = jnp.asarray(rng.integers(0, c, (b, m)), jnp.int32)
    mask = np.zeros((b, m, 1), np.float32)
    mask[:, :3] = 1
    pb = jnp.asarray(
        np.sort(rng.uniform(0, 128, (b, a, 2, 2)), axis=2).reshape(b, a, 4),
        jnp.float32)
    for scale in (1e-2, 1e-6):  # healthy and collapsed score regimes
        scores = jnp.asarray(rng.uniform(0, 1, (b, a, c)) * scale,
                             jnp.float32)
        lbl, _, soft = task_aligned_assign(
            scores, pb, pts, labels, jnp.asarray(gt), jnp.asarray(mask),
            bg_index=c, num_classes=c)
        npos = int((np.asarray(lbl) != c).sum())
        assert npos > 0, f"no positives at score scale {scale}"


def test_assigner_targets_carry_no_gradient(tiny_ppyoloe, rng):
    """Reference detaches assigner inputs (tlx.convert_to_tensor graph
    break, ppyoloe.py:904; upstream paddle assigners are @no_grad).
    Without it the VFL loss shrinks its own targets — for p < 0.5,
    dCE/dtarget = log((1-p)/p) > 0 — and scores collapse to zero (the
    r4 sweep: loss 0.98 -> 0.003 within 300 steps of the TAL switch,
    mAP 0.0).  Invariant: the loss gradient is IDENTICAL whether or not
    the assigner outputs are explicitly stop_gradient-ed."""
    import sys
    # the package re-exports the `ppyoloe` FACTORY under the submodule's
    # name, so `import ... as pp` would bind the function — go via
    # sys.modules to get the module itself
    pp = sys.modules["tlxcv_tpu.models.detection.ppyoloe"]

    model = tiny_ppyoloe
    params, state = split(model)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
    boxes = np.zeros((2, 4, 4), np.float32)
    boxes[:, :2, :2] = rng.uniform(5, 25, size=(2, 2, 2))
    boxes[:, :2, 2:] = boxes[:, :2, :2] + rng.uniform(10, 30, size=(2, 2, 2))
    targets = {"boxes": jnp.asarray(boxes),
               "class_labels": jnp.asarray(rng.integers(0, 4, size=(2, 4)),
                                           jnp.int32)}

    def grad_for(epoch):
        def call(m, x, t):
            return m.loss_fn(m(x, epoch_id=epoch), t)

        lp = pure(model, call)
        return jax.grad(lambda p: lp(p, state, x, targets, training=True)[0]
                        )(params)

    originals = {"task_aligned_assign": pp.task_aligned_assign,
                 "atss_assign": pp.atss_assign}

    def detached(fn):
        def wrapped(*a, **k):
            return jax.tree_util.tree_map(jax.lax.stop_gradient, fn(*a, **k))
        return wrapped

    for epoch in (0, 100):  # ATSS phase, then TaskAligned phase
        g1 = grad_for(epoch)
        try:
            pp.task_aligned_assign = detached(originals["task_aligned_assign"])
            pp.atss_assign = detached(originals["atss_assign"])
            g2 = grad_for(epoch)
        finally:
            pp.task_aligned_assign = originals["task_aligned_assign"]
            pp.atss_assign = originals["atss_assign"]
        for key in g1:
            np.testing.assert_allclose(
                np.asarray(g1[key]), np.asarray(g2[key]), atol=0, rtol=0,
                err_msg=f"gradient flows through assigner targets "
                        f"(epoch {epoch}, param {key})")
