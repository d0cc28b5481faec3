"""Detection zoo wave 3 — YOLOX / GFL / TOOD (reference README's claimed
detection table, README.md:112-126).  Tiny configs, 64px inputs."""
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


def _drive(model, rng, steps=15, bar=0.8):
    params, state = split(model)
    fwd = pure(model)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
    out, _ = fwd(params, state, x, training=False)
    dets, counts = out[0], out[1]
    assert dets.shape[0] == 2 and dets.shape[2] == 6
    assert np.isfinite(np.asarray(dets, np.float32)).all()

    targets = _targets(rng)
    lp = pure(model, lambda m, v, t: m.loss_fn(m(v), t))
    tx = optax.adam(1e-3)
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
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * bar, (losses[0], losses[-1])


def test_yolox_learns(rng):
    from tlxcv_tpu.models.detection import yolox

    _drive(yolox("yolox_nano", num_classes=5), rng)


def test_yolox_focus_is_space_to_depth(rng):
    from tlxcv_tpu.models.detection.yolox import _focus

    x = jnp.asarray(rng.normal(size=(1, 4, 4, 3)), jnp.float32)
    y = _focus(x)
    assert y.shape == (1, 2, 2, 12)
    # each output pixel carries its 2x2 input patch
    np.testing.assert_allclose(
        np.asarray(y[0, 0, 0]).reshape(2, 2, 3), np.asarray(x[0, :2, :2]))


def test_simota_static_shapes_and_assignment():
    """A point inside a lone GT with a confident matching prediction is
    claimed by that GT; points outside every center region are not."""
    from tlxcv_tpu.models.detection.yolox import simota_assign

    points = jnp.asarray([[8.0, 8.0], [40.0, 40.0], [200.0, 200.0]])
    strides = jnp.asarray([8.0, 8.0, 8.0])
    boxes = jnp.asarray([[4, 4, 12, 12], [36, 36, 44, 44],
                         [196, 196, 204, 204]], jnp.float32)
    cls_prob = jnp.asarray([[0.9, 0.1], [0.1, 0.9], [0.5, 0.5]])
    obj_prob = jnp.asarray([0.9, 0.9, 0.9])
    gt = jnp.asarray([[2, 2, 14, 14]], jnp.float32)
    best_gt, fg = simota_assign(boxes, cls_prob, obj_prob, points, strides,
                                gt, jnp.asarray([0]), jnp.asarray([1.0]), 2)
    fg = np.asarray(fg)
    assert fg[0] and not fg[2]
    assert np.asarray(best_gt)[0] == 0


def test_simota_zero_candidate_gt_selects_nothing():
    """A valid GT with no (in_box|in_center) candidate points must mark
    NO foreground (advisor r2: the rank-threshold used to pick an
    arbitrary far-away point through the 1e5 cost inflation)."""
    from tlxcv_tpu.models.detection.yolox import simota_assign

    points = jnp.asarray([[8.0, 8.0], [40.0, 40.0]])
    strides = jnp.asarray([8.0, 8.0])
    boxes = jnp.asarray([[4, 4, 12, 12], [36, 36, 44, 44]], jnp.float32)
    cls_prob = jnp.full((2, 2), 0.5)
    obj_prob = jnp.full((2,), 0.5)
    gt = jnp.asarray([[500, 500, 510, 510]], jnp.float32)  # off-grid
    _, fg = simota_assign(boxes, cls_prob, obj_prob, points, strides,
                          gt, jnp.asarray([0]), jnp.asarray([1.0]), 2)
    assert np.asarray(fg).sum() == 0


def test_gfl_learns(rng):
    from tlxcv_tpu.models.detection import GFL

    _drive(GFL(num_classes=5, backbone=_tiny_backbone()), rng)


def test_gfl_integral_expectation():
    from tlxcv_tpu.models.detection.gfl import integral

    # put all mass on bin 3 for every side -> distance 3
    logits = np.full((1, 1, 4 * 17), -20.0, np.float32)
    for side in range(4):
        logits[..., side * 17 + 3] = 20.0
    d = np.asarray(integral(jnp.asarray(logits), 16))
    np.testing.assert_allclose(d, 3.0, atol=1e-4)


def test_tood_learns(rng):
    from tlxcv_tpu.models.detection import TOOD

    _drive(TOOD(num_classes=5, backbone=_tiny_backbone()), rng)


def test_tood_bilinear_sample_identity_and_shift(rng):
    from tlxcv_tpu.models.detection.tood import _bilinear_sample

    feat = jnp.asarray(rng.normal(size=(1, 5, 6, 2)), jnp.float32)
    gx = jnp.broadcast_to(jnp.arange(6.0)[None, None, :], (1, 5, 6))
    gy = jnp.broadcast_to(jnp.arange(5.0)[None, :, None], (1, 5, 6))
    # zero offset reproduces the input
    np.testing.assert_allclose(np.asarray(_bilinear_sample(feat, gx, gy)),
                               np.asarray(feat), atol=1e-6)
    # +0.5 x offset averages horizontal neighbors (interior)
    s = np.asarray(_bilinear_sample(feat, gx + 0.5, gy))
    expect = 0.5 * (np.asarray(feat)[:, :, :-1] + np.asarray(feat)[:, :, 1:])
    np.testing.assert_allclose(s[:, :, :-1], expect, atol=1e-6)


def test_registry_builds_wave3():
    from tlxcv_tpu.config import create_model

    for name in ("yolox_nano", "gfl_r50", "tood_r50"):
        m = create_model(name, num_classes=3)
        assert m.num_classes == 3
