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
