"""Full train-state checkpoint/resume (the capability the reference lacked
— its 'resume' was weights-only, SURVEY.md §5.4)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

import tlxcv_tpu.nn as nn
from tlxcv_tpu.core import pure, split
from tlxcv_tpu.utils.checkpoint import TrainCheckpoint


class Net(nn.Module):
    def __init__(self):
        self.fc1 = nn.Linear(4, 8)
        self.bn = nn.BatchNorm(8)
        self.fc2 = nn.Linear(8, 2)

    def __call__(self, x):
        return self.fc2(nn.relu(self.bn(self.fc1(x))))


def test_train_state_resume(tmp_path, rng):
    net = Net()
    params, state = split(net)
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)
    fwd = pure(net)
    x = jnp.asarray(rng.normal(size=(8, 4)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 2, size=(8,)), jnp.int32)

    @jax.jit
    def step(params, state, opt_state, x, y):
        def lf(p):
            out, ns = fwd(p, state, x, training=True)
            return optax.softmax_cross_entropy_with_integer_labels(out, y).mean(), ns
        (loss, state), g = jax.value_and_grad(lf, has_aux=True)(params)
        u, opt_state = tx.update(g, opt_state)
        return optax.apply_updates(params, u), state, opt_state, loss

    # run 3 steps, checkpoint, run 2 more (branch A)
    for i in range(3):
        params, state, opt_state, _ = step(params, state, opt_state, x, y)
    path = str(tmp_path / "ckpt.npz")
    TrainCheckpoint.save(path, params, state, opt_state, step=3)
    pa, sa, oa = params, state, opt_state
    for i in range(2):
        pa, sa, oa, la = step(pa, sa, oa, x, y)

    # restore and run the same 2 steps (branch B) — must match exactly
    pb, sb, ob, n = TrainCheckpoint.restore(path, params, state, opt_state)
    assert n == 3
    for i in range(2):
        pb, sb, ob, lb = step(pb, sb, ob, x, y)
    assert float(la) == float(lb)
    for k in pa:
        np.testing.assert_allclose(np.asarray(pa[k]), np.asarray(pb[k]),
                                   atol=1e-7)


def test_bf16_weights_roundtrip(tmp_path):
    """npz can't natively round-trip ml_dtypes — bfloat16 used to load
    back as void '|V2' and silently corrupt the checkpoint.  The dtype
    manifest in utils/checkpoint must restore it exactly."""
    net = Net()
    for _, v in net.variables():
        if v.value.dtype == jnp.float32:
            v.value = v.value.astype(jnp.bfloat16)
    before = {k: np.asarray(v, np.float32)
              for k, v in net.state_dict().items()}
    path = str(tmp_path / "w.npz")
    net.save_weights(path)

    net2 = Net()
    net2.load_weights(path)
    for k, v in net2.state_dict().items():
        assert v.dtype == jnp.bfloat16 or np.asarray(v).dtype.name == "bfloat16", (k, v.dtype)
        np.testing.assert_array_equal(np.asarray(v, np.float32), before[k])

    # TrainCheckpoint: bf16 params + f32 opt state through the same path
    params, state = split(net)
    tx = optax.adam(1e-2)
    opt_state = tx.init({k: np.asarray(v, np.float32)
                         for k, v in params.items()})
    cpath = str(tmp_path / "ckpt.npz")
    TrainCheckpoint.save(cpath, params, state, opt_state, step=7)
    p2, s2, o2, n = TrainCheckpoint.restore(cpath, params, state, opt_state)
    assert n == 7
    for k in params:
        assert np.asarray(p2[k]).dtype.name == "bfloat16"
        np.testing.assert_array_equal(np.asarray(p2[k], np.float32),
                                      np.asarray(params[k], np.float32))


def test_trainer_checkpoint_resume_exact(tmp_path, rng):
    """Trainer.save_checkpoint/restore_checkpoint: exact resume incl.
    optimizer state, EMA params and step counter."""
    import optax

    from tlxcv_tpu.train import Trainer

    net = Net()
    tr = Trainer(net, loss_fn=lambda o, t: optax.softmax_cross_entropy_with_integer_labels(o, t).mean(),
                 optimizer=optax.adam(1e-2), ema_decay=0.9)
    x = jnp.asarray(rng.normal(size=(8, 4)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 2, size=(8,)), jnp.int32)

    def step():
        (tr.params, tr.state, tr.opt_state, tr.ema_params, loss, _
         ) = tr._train_step(tr.params, tr.state, tr.opt_state,
                            tr.ema_params, x, y, jax.random.key(tr.step))
        tr.step += 1
        return loss

    for _ in range(3):
        step()
    path = str(tmp_path / "tr.npz")
    tr.save_checkpoint(path)
    la = float(step())  # branch A: one more step
    pa = {k: np.asarray(v) for k, v in tr.params.items()}
    ea = {k: np.asarray(v) for k, v in tr.ema_params.items()}

    tr.restore_checkpoint(path)
    assert tr.step == 3
    lb = float(step())  # branch B: replay the same step
    assert la == lb
    for k in pa:
        np.testing.assert_array_equal(np.asarray(tr.params[k]), pa[k])
        np.testing.assert_array_equal(np.asarray(tr.ema_params[k]), ea[k])
