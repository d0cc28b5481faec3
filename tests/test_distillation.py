"""Distillation-aware training (DeiT/LeViT recipe, tasks/distillation.py):
a LeViT micro-student with distillation=True learns a synthetic 2-class
problem from labels AND a frozen teacher; the teacher stays outside the
train graph (teacher_labels wrapper).
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tlxcv_tpu import nn
from tlxcv_tpu.core import pure, split
from tlxcv_tpu.tasks import DistilledClassification, teacher_labels


def _toy_data(rng, n=256, size=32):
    """Two classes separable by mean intensity."""
    y = rng.integers(0, 2, size=n)
    x = rng.normal(size=(n, size, size, 3)).astype(np.float32) * 0.5
    x += y[:, None, None, None] * 1.0
    return x.astype(np.float32), y.astype(np.int32)


class TinyTeacher(nn.Module):
    def __init__(self, num_classes=2):
        self.conv = nn.Conv2d(3, 8, 3, stride=2, padding=1)
        self.fc = nn.Linear(8, num_classes)

    def __call__(self, x):
        x = nn.relu(self.conv(x))
        return self.fc(x.mean(axis=(1, 2)))


def _train_teacher(x, y, steps=60):
    teacher = TinyTeacher()
    params, state = split(teacher)
    fwd = pure(teacher)
    opt = optax.adam(3e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, x, y):
        def lf(p):
            out, _ = fwd(p, state, x)
            return jnp.mean(optax.softmax_cross_entropy_with_integer_labels(
                out, y))
        loss, g = jax.value_and_grad(lf)(params)
        up, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(params, up), opt_state, loss

    xb, yb = jnp.asarray(x), jnp.asarray(y)
    for _ in range(steps):
        params, opt_state, loss = step(params, opt_state, xb, yb)
    out, _ = fwd(params, state, xb)
    acc = float(jnp.mean(jnp.argmax(out, -1) == yb))
    assert acc > 0.9, f"teacher failed to learn: {acc}"
    return teacher, params, state


@pytest.mark.parametrize("hard", [True, False])
def test_levit_distillation_training(rng, hard):
    from tlxcv_tpu.models.classification.levit import LeViT
    from tlxcv_tpu.train import Trainer

    x, y = _toy_data(rng)
    teacher, tparams, tstate = _train_teacher(x, y)

    student = LeViT(img_size=32, num_classes=2, embed_dim=(16, 24, 32),
                    key_dim=(4, 4, 4), depth=(1, 1, 1), num_heads=(2, 2, 2),
                    distillation=True)
    task = DistilledClassification(student, hard=hard)

    class Loader:
        def __iter__(self):
            batches = [(x[i:i + 32], y[i:i + 32])
                       for i in range(0, len(x), 32)]
            return iter(teacher_labels(teacher, batches, tparams, tstate))

    trainer = Trainer(task, optimizer=optax.adam(1e-3))
    loader = Loader()
    first = trainer.evaluate(loader)["loss"]
    trainer.train(n_epoch=4, train_dataset=loader, print_freq=100)
    last = trainer.evaluate(loader)["loss"]
    assert last < first * 0.7, (first, last)

    # eval path: averaged dual head
    logits = trainer.predict(jnp.asarray(x[:64]))
    acc = float(jnp.mean(jnp.argmax(logits, -1) == jnp.asarray(y[:64])))
    assert acc > 0.8, acc


def test_distillation_loss_terms(rng):
    """Both objective terms must carry gradient to their own head: the
    class head gets no gradient from the teacher term and vice versa."""
    from tlxcv_tpu.models.classification.levit import LeViT

    student = LeViT(img_size=32, num_classes=2, embed_dim=(16, 24, 32),
                    key_dim=(4, 4, 4), depth=(1, 1, 1), num_heads=(2, 2, 2),
                    distillation=True)
    task = DistilledClassification(student, hard=True)
    params, state = split(task)
    x = jnp.asarray(rng.normal(size=(4, 32, 32, 3)), jnp.float32)
    target = {"label": jnp.asarray([0, 1, 0, 1]),
              "teacher": jnp.asarray(rng.normal(size=(4, 2)), jnp.float32)}

    def lf(p):
        out, _ = pure(task)(p, state, x, training=True)
        return task.loss_fn(out, target)

    g = jax.grad(lf)(params)
    head_g = [np.abs(np.asarray(v)).sum() for k, v in g.items()
              if "head/" in k or k.startswith("backbone/head/")]
    dist_g = [np.abs(np.asarray(v)).sum() for k, v in g.items()
              if "head_dist" in k]
    assert head_g and dist_g
    assert sum(head_g) > 0 and sum(dist_g) > 0
