"""Detection training actually learns: tiny YOLOv3 on a fixed synthetic
batch — total loss must decrease substantially."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from tlxcv_tpu.core import Rngs, pure, split
from tlxcv_tpu.models.detection import YOLOv3


def test_yolov3_loss_decreases(rng):
    model = YOLOv3(num_classes=3)
    params, state = split(model)
    x = jnp.asarray(rng.normal(size=(2, 96, 96, 3)), jnp.float32)
    boxes = np.zeros((2, 4, 4), np.float32)
    boxes[:, :2, 0:2] = rng.uniform(0.3, 0.7, size=(2, 2, 2))
    boxes[:, :2, 2:4] = rng.uniform(0.2, 0.5, size=(2, 2, 2))
    targets = {"boxes": jnp.asarray(boxes),
               "class_labels": jnp.asarray(
                   rng.integers(0, 3, size=(2, 4)), jnp.int32)}

    lp = pure(model, lambda m, x, t: m.loss_fn(m(x), t))
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, state, opt_state):
        def lf(p):
            loss, ns = lp(p, state, x, targets, training=True,
                          rngs=Rngs(jax.random.key(0)))
            return loss, ns
        (loss, state), g = jax.value_and_grad(lf, has_aux=True)(params)
        u, opt_state = tx.update(g, opt_state)
        return optax.apply_updates(params, u), state, opt_state, loss

    losses = []
    for _ in range(25):
        params, state, opt_state, loss = step(params, state, opt_state)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])


def test_ssd_loss_decreases(rng):
    from tlxcv_tpu.models.detection.ssd import SSD

    model = SSD(num_classes=3, image_size=(96, 96), keep_top_k=10)
    params, state = split(model)
    x = jnp.asarray(rng.normal(size=(2, 96, 96, 3)), jnp.float32)
    boxes = np.zeros((2, 4, 4), np.float32)
    boxes[:, :2] = np.sort(rng.uniform(0.2, 0.8, size=(2, 2, 2, 2)),
                           axis=2).reshape(2, 2, 4)
    targets = {"boxes": jnp.asarray(boxes),
               "class_labels": jnp.asarray(
                   rng.integers(0, 3, size=(2, 4)), jnp.int32)}

    lp = pure(model, lambda m, x, t: m.loss_fn(m(x), t))
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, state, opt_state):
        def lf(p):
            loss, ns = lp(p, state, x, targets, training=True,
                          rngs=Rngs(jax.random.key(0)))
            return loss, ns
        (loss, state), g = jax.value_and_grad(lf, has_aux=True)(params)
        u, opt_state = tx.update(g, opt_state)
        return optax.apply_updates(params, u), state, opt_state, loss

    losses = []
    for _ in range(20):
        params, state, opt_state, loss = step(params, state, opt_state)
        losses.append(float(loss))
    assert np.isfinite(losses).all(), losses
    assert losses[-1] < losses[0] * 0.7, (losses[0], losses[-1])


def test_ppyoloe_loss_decreases(rng):
    from tlxcv_tpu.models.detection.ppyoloe import ppyoloe

    model = ppyoloe("ppyoloe_s", num_classes=3)
    params, state = split(model)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
    boxes = np.zeros((2, 3, 4), np.float32)
    boxes[:, :2, :2] = rng.uniform(5, 25, size=(2, 2, 2))
    boxes[:, :2, 2:] = boxes[:, :2, :2] + rng.uniform(15, 30, size=(2, 2, 2))
    targets = {"boxes": jnp.asarray(boxes),
               "class_labels": jnp.asarray(
                   rng.integers(0, 3, size=(2, 3)), jnp.int32)}

    def call(m, x, t):
        out = m(x, epoch_id=100)  # TaskAligned phase
        return m.loss_fn(out, t)

    lp = pure(model, call)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, state, opt_state):
        def lf(p):
            loss, ns = lp(p, state, x, targets, training=True,
                          rngs=Rngs(jax.random.key(0)))
            return loss, ns
        (loss, state), g = jax.value_and_grad(lf, has_aux=True)(params)
        u, opt_state = tx.update(g, opt_state)
        return optax.apply_updates(params, u), state, opt_state, loss

    losses = []
    for _ in range(20):
        params, state, opt_state, loss = step(params, state, opt_state)
        losses.append(float(loss))
    assert np.isfinite(losses).all(), losses
    assert losses[-1] < losses[0] * 0.9, (losses[0], losses[-1])
