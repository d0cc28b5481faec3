"""Detection zoo wave 2 — FCOS / RetinaNet / Faster R-CNN / Cascade R-CNN
(the reference README's claimed-but-unshipped detection table,
README.md:112-126).  Tiny configs: resnet18 trunk, 64px inputs."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tlxcv_tpu.core import pure, split


def _tiny_backbone():
    from tlxcv_tpu.models.classification.resnet import ResNet

    return ResNet(depth=18, num_classes=0, with_pool=False)


def _targets(rng, n=2, m=3, img=64, nc=5):
    boxes = np.zeros((n, m, 4), np.float32)
    xy = rng.uniform(2, img // 2, size=(n, 2, 2)).astype(np.float32)
    wh = rng.uniform(img // 4, img // 2, size=(n, 2, 2)).astype(np.float32)
    boxes[:, :2, :2] = xy
    boxes[:, :2, 2:] = np.minimum(xy + wh, img - 1)
    mask = np.zeros((n, m), np.float32)
    mask[:, :2] = 1.0
    return {"boxes": jnp.asarray(boxes),
            "class_labels": jnp.asarray(
                rng.integers(0, nc, size=(n, m)), jnp.int32),
            "mask": jnp.asarray(mask)}


def _train_steps(model, x, targets, steps=20, lr=1e-3):
    params, state = split(model)
    lp = pure(model, lambda m, v, t: m.loss_fn(m(v), t))
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, state, opt_state):
        def lf(p):
            loss, ns = lp(p, state, x, targets, training=True)
            return loss, ns

        (loss, state), g = jax.value_and_grad(lf, has_aux=True)(params)
        u, opt_state = tx.update(g, opt_state)
        return optax.apply_updates(params, u), state, opt_state, loss

    losses = []
    for _ in range(steps):
        params, state, opt_state, loss = step(params, state, opt_state)
        losses.append(float(loss))
    return losses


def _eval_shapes(model, x, keep):
    params, state = split(model)
    fwd = pure(model)
    out, _ = fwd(params, state, x, training=False)
    dets, counts = out[0], out[1]
    assert dets.shape[0] == x.shape[0] and dets.shape[2] == 6
    assert dets.shape[1] <= keep
    assert counts.shape == (x.shape[0],)
    assert np.isfinite(np.asarray(dets, np.float32)).all()


def test_fcos_eval_and_learns(rng):
    from tlxcv_tpu.models.detection import FCOS

    model = FCOS(num_classes=5, backbone=_tiny_backbone())
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
    _eval_shapes(model, x, 100)
    losses = _train_steps(model, x, _targets(rng), steps=20)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.7, (losses[0], losses[-1])


def test_fcos_target_assignment_semantics():
    """A point at a GT's center lands on the level whose range covers the
    max regression distance, with centerness 1 there."""
    from tlxcv_tpu.models.detection.fcos import (LEVEL_RANGES, STRIDES,
                                                 _level_points, fcos_targets)

    feat_hws = [(8, 8), (4, 4), (2, 2), (1, 1), (1, 1)]
    pts = _level_points(feat_hws)
    points = jnp.concatenate(pts, 0)
    strides = jnp.concatenate([jnp.full((p.shape[0],), s, jnp.float32)
                               for p, s in zip(pts, STRIDES)])
    ranges = jnp.concatenate([
        jnp.broadcast_to(jnp.asarray(r, jnp.float32), (p.shape[0], 2))
        for p, r in zip(pts, LEVEL_RANGES)])
    # box centered on (28, 28), 56x56 -> max dist 28 -> level 0 (<=64)
    gt = jnp.asarray([[0.0, 0.0, 56.0, 56.0]])
    cls_t, ltrb, ctr, pos = fcos_targets(
        points, strides, ranges, gt, jnp.asarray([2]), jnp.asarray([1.0]), 5)
    pos = np.asarray(pos)
    lvl0 = np.asarray(strides) == 8
    assert pos[lvl0].any() and not pos[~lvl0].any()
    # the grid point nearest the center has the highest centerness
    center_idx = np.argmin(np.abs(np.asarray(points) - 28.0).sum(-1))
    assert pos[center_idx]
    assert np.asarray(ctr)[center_idx] == pytest.approx(
        np.asarray(ctr)[pos].max())
    assert np.asarray(cls_t)[center_idx] == 2
    # all non-positives are background class
    assert (np.asarray(cls_t)[~pos] == 5).all()


def test_retinanet_eval_and_learns(rng):
    from tlxcv_tpu.models.detection import RetinaNet

    model = RetinaNet(num_classes=5, backbone=_tiny_backbone())
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
    _eval_shapes(model, x, 100)
    losses = _train_steps(model, x, _targets(rng), steps=20)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.7, (losses[0], losses[-1])


def test_retina_match_band_semantics():
    """IoU>=.5 positive, (.4,.5) ignored, each GT's best anchor forced."""
    from tlxcv_tpu.models.detection.retinanet import retina_match

    anchors = jnp.asarray([[0, 0, 10, 10],     # IoU 1 with gt0
                           [0, 0, 10, 9],      # IoU .9
                           [0, 0, 10, 4.6],    # IoU .46 -> ignore band
                           [50, 50, 60, 60]],  # far -> negative
                          jnp.float32)
    gt = jnp.asarray([[0, 0, 10, 10]], jnp.float32)
    best_gt, pos, ignore = retina_match(anchors, gt, jnp.asarray([1]),
                                        jnp.asarray([1.0]))
    pos, ignore = np.asarray(pos), np.asarray(ignore)
    assert pos[0] and pos[1] and not pos[3]
    assert ignore[2] and not ignore[0]
    # a lone low-IoU best anchor still gets forced positive
    far_gt = jnp.asarray([[48, 48, 62, 62]], jnp.float32)
    _, pos2, _ = retina_match(anchors, far_gt, jnp.asarray([1]),
                              jnp.asarray([1.0]))
    assert np.asarray(pos2)[3]


def _grad_check(model, x, targets, head_keys):
    """Two-stage detectors can't hit a learn bar in 15 steps from random
    init (the RPN proposals are noise at first — same standard as
    tests/test_mask_rcnn.py): check loss finite + every head gets
    gradient + a few steps don't blow up to NaN."""
    params, state = split(model)
    lp = pure(model, lambda m, v, t: m.loss_fn(m(v), t))

    def lf(p):
        loss, ns = lp(p, state, x, targets, training=True)
        return loss, ns

    (loss, _), g = jax.jit(jax.value_and_grad(lf, has_aux=True))(params)
    assert np.isfinite(float(loss)) and float(loss) > 0
    for key in head_keys:
        tot = sum(float(jnp.abs(v).sum()) for k, v in g.items()
                  if k.startswith(key))
        assert tot > 0, key
    losses = _train_steps(model, x, targets, steps=8, lr=1e-4)
    assert np.isfinite(losses).all(), losses


def test_faster_rcnn_eval_and_trains(rng):
    from tlxcv_tpu.models.detection import faster_rcnn

    model = faster_rcnn(num_classes=5, num_proposals=32, pre_nms_top_k=64,
                        backbone=_tiny_backbone())
    assert model.mask_head is None
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
    _eval_shapes(model, x, 100)
    _grad_check(model, x, _targets(rng),
                ("rpn_head/", "box_head/", "cls_score/", "bbox_pred/"))


def test_cascade_rcnn_eval_and_trains(rng):
    from tlxcv_tpu.models.detection import CascadeRCNN

    model = CascadeRCNN(num_classes=5, num_proposals=32, pre_nms_top_k=64,
                        backbone=_tiny_backbone())
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
    _eval_shapes(model, x, 100)
    _grad_check(model, x, _targets(rng),
                ("rpn_head/", "stage_heads/0", "stage_heads/1",
                 "stage_heads/2", "stage_cls/", "stage_reg/"))


def test_registry_builds_new_detectors():
    from tlxcv_tpu.config import create_model

    for name in ("fcos_r50", "retinanet", "faster_rcnn", "cascade_rcnn"):
        m = create_model(name, num_classes=3)
        assert m.num_classes == 3
