"""SSD: priors, matching loss, eval path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tlxcv_tpu.core import pure, split
from tlxcv_tpu.models.detection.ssd import SSD, build_ssd_priors, ssd_decode
from tlxcv_tpu.ops.boxes import bbox2delta


@pytest.fixture(scope="module")
def ssd_model():
    return SSD(num_classes=5, image_size=(96, 96), keep_top_k=10)


def test_ssd_decode_inverts_encode(rng):
    priors = jnp.asarray(build_ssd_priors([(3, 3)] * 6, (96, 96)))
    gt = jnp.asarray(np.clip(rng.uniform(0, 1, size=(1, priors.shape[0], 4)),
                             0, 1).astype(np.float32))
    gt = jnp.sort(gt.reshape(1, -1, 2, 2), axis=2).reshape(1, -1, 4)
    var = (0.1, 0.1, 0.2, 0.2)
    deltas = bbox2delta(jnp.broadcast_to(priors, gt.shape), gt,
                        weights=[1 / v for v in var])
    rec = ssd_decode(deltas, priors, var)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(gt), atol=1e-4)


def test_ssd_train_and_eval(ssd_model, rng):
    model = ssd_model
    params, state = split(model)
    x = jnp.asarray(rng.normal(size=(2, 96, 96, 3)), jnp.float32)

    def train_call(m, x, t):
        out = m(x)
        return m.loss_fn(out, t)

    boxes = np.zeros((2, 6, 4), np.float32)
    boxes[:, :2] = np.sort(rng.uniform(0.1, 0.9, size=(2, 2, 2, 2)), axis=2
                           ).reshape(2, 2, 4)
    targets = {
        "boxes": jnp.asarray(boxes),
        "class_labels": jnp.asarray(rng.integers(0, 5, size=(2, 6)), jnp.int32),
    }
    lp = pure(model, train_call)
    loss, _ = jax.jit(lambda p, s: lp(p, s, x, targets, training=True))(params, state)
    assert np.isfinite(float(loss)) and float(loss) > 0

    g = jax.grad(lambda p: lp(p, state, x, targets, training=True)[0])(params)
    assert all(np.isfinite(np.asarray(v)).all() for v in g.values())

    fwd = pure(model)
    (dets, counts), _ = jax.jit(lambda p, s, x: fwd(p, s, x))(params, state, x)
    assert dets.shape == (2, 10, 6) and counts.shape == (2,)
