"""End-to-end slice: model + task + trainer + data, the framework's
executable spec (mirrors reference demo/image_classification)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tlxcv_tpu
from tlxcv_tpu.data import Circles, DataLoader
from tlxcv_tpu.models import resnet18, vgg11
from tlxcv_tpu.tasks import ImageClassification
from tlxcv_tpu.train import Trainer, optimizers
from tlxcv_tpu.utils import Accuracy


class ArrayPairs:
    """Minimal in-memory dataset."""

    def __init__(self, x, y):
        self.x, self.y = x, y

    def __getitem__(self, i):
        return self.x[i], self.y[i]

    def __len__(self):
        return len(self.x)


def make_classification_data(rng, n=64, nc=4, hw=32):
    """Linearly separable-ish: class mean brightness differs per channel."""
    y = rng.integers(0, nc, size=(n,))
    x = rng.normal(size=(n, hw, hw, 3)).astype(np.float32)
    for i in range(n):
        x[i, :, :, y[i] % 3] += 2.0 + y[i]
    return x, y.astype(np.int32)


def test_resnet18_trains_and_memorizes(rng):
    x, y = make_classification_data(rng)
    loader = DataLoader(ArrayPairs(x, y), batch_size=16, shuffle=True)
    model = ImageClassification(resnet18(num_classes=4))
    trainer = Trainer(network=model, loss_fn=model.loss_fn,
                      optimizer=optimizers.Adam(1e-3), metrics=Accuracy())
    trainer.train(n_epoch=4, train_dataset=loader, print_freq=10)
    res = trainer.evaluate(loader)
    assert res["metric"] > 0.8, res


def test_trainer_save_load_roundtrip(tmp_path, rng):
    # resnet18, not vgg11: the BN save/load semantics are identical but
    # vgg11's 128M params x (adam state) x 8 virtual devices was a ~16GB
    # commit spike that aborted the suite near the memory ceiling
    x, y = make_classification_data(rng, n=16)
    loader = DataLoader(ArrayPairs(x, y), batch_size=8)
    model = ImageClassification(resnet18(num_classes=4))
    trainer = Trainer(network=model, optimizer=optimizers.Adam(1e-3))
    trainer.train(n_epoch=1, train_dataset=loader, print_freq=10)
    pred_before = np.asarray(trainer.predict(x[:4]))

    path = str(tmp_path / "model.npz")
    trainer.save_weights(path)

    model2 = ImageClassification(resnet18(num_classes=4))
    trainer2 = Trainer(network=model2, optimizer=optimizers.Adam(1e-3))
    trainer2.load_weights(path)
    pred_after = np.asarray(trainer2.predict(x[:4]))
    np.testing.assert_allclose(pred_before, pred_after, atol=1e-5)


def test_data_parallel_8dev(rng):
    """Train on the virtual 8-device mesh; batch sharded over 'data'."""
    from tlxcv_tpu.parallel import make_mesh

    assert len(jax.devices()) == 8
    mesh = make_mesh(8, 1)
    x, y = make_classification_data(rng, n=64)
    loader = DataLoader(ArrayPairs(x, y), batch_size=32)
    model = ImageClassification(resnet18(num_classes=4))
    trainer = Trainer(network=model, optimizer=optimizers.Adam(1e-3),
                      metrics=Accuracy(), mesh=mesh)
    # 8 epochs: multi-device CPU training is NONdeterministic run-to-run
    # (collective accumulation order), so train far past the bar — at 3
    # epochs the same seeds land anywhere in 0.31..0.78
    trainer.train(n_epoch=8, train_dataset=loader, print_freq=10)
    res = trainer.evaluate(loader)
    assert res["metric"] > 0.8, res


def test_circles_dataset_shapes():
    ds = Circles(num=4, nx=64, ny=64, seed=0)
    img, mask = ds[0]
    assert img.shape == (64, 64, 1) and mask.shape == (64, 64, 2)
    assert 0.0 <= img.min() and img.max() <= 1.0


def test_resnet_feature_pyramid():
    m = resnet18(num_classes=0, with_pool=False)
    feats = m.features(jnp.zeros((1, 64, 64, 3)))
    assert [f.shape for f in feats] == [
        (1, 16, 16, 64), (1, 8, 8, 128), (1, 4, 4, 256), (1, 2, 2, 512)]


def test_trainer_ema(rng):
    """ema_decay keeps an in-step EMA; eval/predict/save use it."""
    import optax

    x, y = make_classification_data(rng, n=16)
    loader = DataLoader(ArrayPairs(x, y), batch_size=8, shuffle=False)
    model = ImageClassification(resnet18(num_classes=4))
    tr = Trainer(model, optimizer=optax.sgd(1e-2), ema_decay=0.9)
    raw0 = {k: np.asarray(v) for k, v in tr.params.items()}
    tr.train(n_epoch=2, train_dataset=loader)
    # manual recomputation of the EMA for one representative leaf is
    # impossible without replaying updates, but the invariants are:
    k = next(iter(tr.params))
    p, e = np.asarray(tr.params[k]), np.asarray(tr.ema_params[k])
    assert not np.allclose(p, e)        # ema lags the raw weights
    # ema stays between init and the raw end point (a convex filter)
    assert np.abs(e - raw0[k]).max() <= np.abs(p - raw0[k]).max() + 1e-6
    # eval path routes through the ema
    assert tr.eval_params is tr.ema_params
    out_ema = np.asarray(tr.predict(x[:4]))
    tr.ema_for_eval = False
    out_raw = np.asarray(tr.predict(x[:4]))
    assert not np.allclose(out_ema, out_raw)
    # exact recurrence check over two manual steps from a fresh trainer
    tr2 = Trainer(model, optimizer=optax.sgd(1e-2), ema_decay=0.5)
    manual = dict(tr2.ema_params)
    for _ in range(2):
        xb, yb = tr2._put_batch((x[:8], y[:8]))
        (tr2.params, tr2.state, tr2.opt_state, tr2.ema_params, _, _
         ) = tr2._train_step(tr2.params, tr2.state, tr2.opt_state,
                             tr2.ema_params, xb, yb, jax.random.key(0))
        manual = {kk: 0.5 * manual[kk] + 0.5 * tr2.params[kk]
                  for kk in manual}
    for kk in list(manual)[:5]:
        np.testing.assert_allclose(np.asarray(manual[kk]),
                                   np.asarray(tr2.ema_params[kk]),
                                   rtol=1e-5, atol=1e-6)


def test_config_build_trainer_wires_ema():
    from tlxcv_tpu.config import Config

    c = Config(model="resnet18", model_kwargs={"num_classes": 4},
               ema_decay=0.99)
    tr = c.build_trainer()
    assert tr.ema_decay == 0.99 and tr.ema_params is not None
    tr2 = Config(model="resnet18",
                 model_kwargs={"num_classes": 4}).build_trainer()
    assert tr2.ema_params is None


def test_trainer_mixed_precision_bf16(rng):
    """compute_dtype=bf16: f32 masters/opt/BN-stats, bf16 compute."""
    import optax

    x, y = make_classification_data(rng, n=32)
    loader = DataLoader(ArrayPairs(x, y), batch_size=16, shuffle=False)
    model = ImageClassification(resnet18(num_classes=4))
    tr = Trainer(model, optimizer=optax.adam(1e-3),
                 compute_dtype=jnp.bfloat16)
    xb, yb = tr._put_batch((x[:16], y[:16]))
    l0 = None
    for i in range(10):
        (tr.params, tr.state, tr.opt_state, _, loss, _) = tr._train_step(
            tr.params, tr.state, tr.opt_state, None, xb, yb,
            jax.random.key(i))
        l0 = float(loss) if l0 is None else l0
    assert float(loss) < l0, (float(loss), l0)
    # masters, optimizer state and BN stats all stayed f32
    assert all(v.dtype == jnp.float32 for v in tr.params.values()
               if jnp.issubdtype(v.dtype, jnp.floating))
    assert all(v.dtype == jnp.float32 for v in tr.state.values()
               if jnp.issubdtype(v.dtype, jnp.floating))
    leaves = jax.tree_util.tree_leaves(tr.opt_state)
    assert all(l.dtype == jnp.float32 for l in leaves
               if hasattr(l, "dtype") and jnp.issubdtype(l.dtype,
                                                         jnp.floating))
    # and the full train() loop runs under the policy
    tr.train(n_epoch=1, train_dataset=loader)


def test_trainer_remat_identical_gradients(rng):
    """remat=True recomputes activations in the backward pass; the
    resulting update must be bit-identical to the plain step."""
    import optax

    x, y = make_classification_data(rng, n=16)

    def one_step(remat):
        from tlxcv_tpu.core.init import set_seed

        set_seed(0)
        model = ImageClassification(resnet18(num_classes=4))
        tr = Trainer(model, optimizer=optax.sgd(1e-2), remat=remat)
        xb, yb = tr._put_batch((x, y))
        p, s, o, _, loss, _ = tr._train_step(tr.params, tr.state,
                                             tr.opt_state, None, xb, yb,
                                             jax.random.key(0))
        return {k: np.asarray(v) for k, v in p.items()}, float(loss)

    p0, l0 = one_step(False)
    p1, l1 = one_step(True)
    assert l0 == l1
    for k in list(p0)[:8]:
        np.testing.assert_array_equal(p0[k], p1[k])


def test_trainer_metrics_with_tuple_outputs(rng):
    """Tuple model outputs (PFLD's (landmarks, features)) + tuple labels
    must flow through the trainer's metric plumbing (review finding:
    np.asarray on the pytree crashed)."""
    from tlxcv_tpu.models.facial_landmark_detection import PFLD
    from tlxcv_tpu.tasks import FacialLandmarkDetection
    from tlxcv_tpu.tasks.facial_landmark_detection import NME

    x = rng.normal(size=(4, 112, 112, 3)).astype(np.float32)
    lm = rng.uniform(0, 1, size=(4, 136)).astype(np.float32)
    eu = rng.normal(size=(4, 3)).astype(np.float32)
    loader = DataLoader(ArrayPairs(x, list(zip(lm, eu))), batch_size=2)

    import optax

    model = FacialLandmarkDetection(PFLD(num_landmarks=68))

    def loss_fn(out, target):
        landmarks, _ = out
        return ((landmarks - target[0]) ** 2).mean()

    tr = Trainer(model, loss_fn=loss_fn, optimizer=optax.adam(1e-4),
                 metrics=NME(num_points=68))
    tr.train(n_epoch=1, train_dataset=loader)
    res = tr.evaluate(loader)
    assert np.isfinite(res["loss"]) and np.isfinite(res["metric"])


def test_trainer_grad_accum_matches_large_batch(rng):
    """grad_accum=k with SGD over k microbatches == one full-batch step
    (MultiSteps averages the accumulated grads; loss is a batch mean)."""
    import optax

    x, y = make_classification_data(rng, n=16)
    # no BN (running-stat drift) and no dropout (mask schedules differ
    # between k micro-steps and one full step)
    model = ImageClassification(vgg11(num_classes=4, dropout=0.0))

    tr_micro = Trainer(model, optimizer=optax.sgd(1e-2), grad_accum=4)
    tr_full = Trainer(model, optimizer=optax.sgd(1e-2))
    # same init: both trainers split() the same module
    for i in range(4):
        xb, yb = tr_micro._put_batch((x[i * 4:(i + 1) * 4],
                                      y[i * 4:(i + 1) * 4]))
        (tr_micro.params, tr_micro.state, tr_micro.opt_state, _, _, _
         ) = tr_micro._train_step(tr_micro.params, tr_micro.state,
                                  tr_micro.opt_state, tr_micro.ema_params,
                                  xb, yb, jax.random.key(0))
    xb, yb = tr_full._put_batch((x, y))
    (tr_full.params, tr_full.state, tr_full.opt_state, _, _, _
     ) = tr_full._train_step(tr_full.params, tr_full.state,
                             tr_full.opt_state, tr_full.ema_params,
                             xb, yb, jax.random.key(0))
    for k in list(tr_full.params)[:6]:
        np.testing.assert_allclose(np.asarray(tr_micro.params[k]),
                                   np.asarray(tr_full.params[k]),
                                   rtol=2e-4, atol=2e-6)


def test_trainer_nan_guard_skips_poison_batch(rng):
    """One NaN batch must not destroy the run: params/opt/BN state keep
    their previous values and the skip is counted."""
    import optax

    x, y = make_classification_data(rng, n=32)
    model = ImageClassification(resnet18(num_classes=4))
    tr = Trainer(model, optimizer=optax.adam(1e-3), nan_guard=True)

    def step(xb, yb):
        xb, yb = tr._put_batch((xb, yb))
        (tr.params, tr.state, tr.opt_state, _, loss, _
         ) = tr._train_step(tr.params, tr.state, tr.opt_state,
                            tr.ema_params, xb, yb, jax.random.key(0))
        return loss

    step(x[:8], y[:8])  # one clean step
    before = {k: np.asarray(v) for k, v in tr.params.items()}
    poison = x[8:16].copy()
    poison[0, 0, 0, 0] = np.nan
    loss = step(poison, y[8:16])
    assert np.isnan(float(loss))  # reported as skipped
    for k in list(before)[:6]:
        np.testing.assert_array_equal(np.asarray(tr.params[k]), before[k])
    tr._count_skips([loss])
    assert tr.nan_skips == 1
    # training continues cleanly afterwards
    loss = step(x[16:24], y[16:24])
    assert np.isfinite(float(loss))


def test_no_decay_mask_exempts_bias_and_norm(rng):
    """weight decay touches only rank>=2 kernels with the standard mask."""
    import jax.numpy as jnp

    from tlxcv_tpu.core import split
    from tlxcv_tpu.train.optimizers import Adam, no_decay_mask

    params, _ = split(resnet18(num_classes=4))
    mask = no_decay_mask(params)
    assert any(mask.values()) and not all(mask.values())
    tx = Adam(1e-3, weight_decay=1e-2, weight_decay_mask=no_decay_mask)
    st = tx.init(params)
    zeros = {k: jnp.zeros_like(v) for k, v in params.items()}
    up, _ = tx.update(zeros, st, params)
    for k, decayed in mask.items():
        assert (float(jnp.abs(up[k]).max()) > 0) == decayed, k


def test_nan_guard_freezes_ema_on_skip(rng):
    """A guarded skip must freeze the EMA too: the naive ordering still
    decays the average toward the (unchanged) params on a skipped step,
    moving eval weights on a batch that was supposed to be a no-op."""
    import optax

    x, y = make_classification_data(rng, n=16)
    model = ImageClassification(resnet18(num_classes=4))
    tr = Trainer(model, optimizer=optax.adam(1e-3), nan_guard=True,
                 ema_decay=0.5)  # aggressive decay: any drift is visible

    def step(xb, yb):
        xb, yb = tr._put_batch((xb, yb))
        (tr.params, tr.state, tr.opt_state, tr.ema_params, loss, _
         ) = tr._train_step(tr.params, tr.state, tr.opt_state,
                            tr.ema_params, xb, yb, jax.random.key(0))
        return loss

    step(x[:8], y[:8])  # one clean step: ema != params now
    ema_before = {k: np.asarray(v) for k, v in tr.ema_params.items()}
    poison = x[8:16].copy()
    poison[0, 0, 0, 0] = np.nan
    loss = step(poison, y[8:16])
    assert np.isnan(float(loss))
    for k in list(ema_before)[:6]:
        np.testing.assert_array_equal(np.asarray(tr.ema_params[k]),
                                      ema_before[k])


def test_ema_advances_once_per_accum_cycle(rng):
    """Under grad_accum=k the EMA must advance once per APPLIED update,
    not once per microbatch — otherwise the effective decay is
    ema_decay**k and the averaging horizon silently shrinks k-fold."""
    import optax

    x, y = make_classification_data(rng, n=16)
    model = ImageClassification(vgg11(num_classes=4, dropout=0.0))
    tr = Trainer(model, optimizer=optax.sgd(1e-2), grad_accum=4,
                 ema_decay=0.5)
    init = {k: np.asarray(v) for k, v in tr.params.items()}

    def micro(i):
        xb, yb = tr._put_batch((x[i * 4:(i + 1) * 4], y[i * 4:(i + 1) * 4]))
        (tr.params, tr.state, tr.opt_state, tr.ema_params, _, _
         ) = tr._train_step(tr.params, tr.state, tr.opt_state,
                            tr.ema_params, xb, yb, jax.random.key(0))

    probe = [k for k in tr.params if "kernel" in k or "weight" in k][:4]
    for i in range(3):  # accumulation no-ops: params AND ema frozen
        micro(i)
        for k in probe:
            np.testing.assert_array_equal(np.asarray(tr.ema_params[k]),
                                          init[k])
    micro(3)  # the applied update: exactly ONE ema step
    for k in probe:
        expect = 0.5 * init[k] + 0.5 * np.asarray(tr.params[k])
        np.testing.assert_allclose(np.asarray(tr.ema_params[k]), expect,
                                   rtol=1e-6, atol=1e-7)


def test_checkpoint_resumes_rng_stream(rng, tmp_path):
    """restore_checkpoint must restore the trainer RNG: for any model
    that consumes rngs in training (dropout), the resumed run's mask
    stream must continue where the saved run left off, not restart from
    the seed."""
    import optax

    x, y = make_classification_data(rng, n=16)
    ds = [(x[:8], y[:8]), (x[8:], y[8:])]

    def make():
        from tlxcv_tpu.core.init import set_seed

        set_seed(0)
        m = ImageClassification(vgg11(num_classes=4, dropout=0.5))
        return Trainer(m, optimizer=optax.sgd(1e-2), seed=7)

    tr = make()
    tr.train(2, ds, print_freq=10)
    tr.nan_skips = 5  # also part of the loop state
    path = str(tmp_path / "rng_ckpt.npz")
    tr.save_checkpoint(path)
    tr.train(1, ds, print_freq=10)  # branch A: uninterrupted

    tr2 = make()
    tr2.restore_checkpoint(path)
    assert tr2.nan_skips == 5
    tr2.train(1, ds, print_freq=10)  # branch B: resumed
    for k in list(tr.params)[:6]:
        np.testing.assert_allclose(np.asarray(tr.params[k]),
                                   np.asarray(tr2.params[k]),
                                   rtol=1e-6, atol=1e-7)


def test_metrics_exclude_nan_guard_skipped_batches(rng):
    """A guarded skip is a no-op by contract: the poisoned batch's
    garbage forward outputs must not feed the epoch train metric."""
    import optax

    from tlxcv_tpu.utils.metrics import Metric

    class CountingAcc(Metric):
        def __init__(self):
            self.calls = 0

        def reset(self):
            self.calls = 0

        def update(self, out, y):
            self.calls += 1
            assert np.isfinite(np.asarray(out)).all(), \
                "skipped batch reached the metric"

        def result(self):
            return float(self.calls)

    x, y = make_classification_data(rng, n=32)
    x[12, 0, 0, 0] = np.nan  # batch 1 of 4 is poisoned
    model = ImageClassification(resnet18(num_classes=4))
    tr = Trainer(model, optimizer=optax.adam(1e-3), nan_guard=True,
                 metrics=CountingAcc())
    ds = [(x[i:i + 8], y[i:i + 8]) for i in range(0, 32, 8)]
    tr.train(1, ds, print_freq=10)
    assert tr.nan_skips == 1
    assert tr.metrics.calls == 3
