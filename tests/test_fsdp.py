"""FSDP (ZeRO-3 parameter sharding) on the virtual 8-device mesh:
sharding placement, numerics vs replicated DP, and training."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import PartitionSpec as P

from tlxcv_tpu import nn
from tlxcv_tpu.core.module import Module
from tlxcv_tpu.parallel import make_mesh
from tlxcv_tpu.parallel.mesh import fsdp_shardings, place_params
from tlxcv_tpu.train import Trainer


class MLP(Module):
    def __init__(self, din=32, hidden=256, dout=4):
        self.fc1 = nn.Linear(din, hidden)
        self.fc2 = nn.Linear(hidden, hidden)
        self.fc3 = nn.Linear(hidden, dout)

    def __call__(self, x):
        return self.fc3(nn.relu(self.fc2(nn.relu(self.fc1(x)))))


def test_fsdp_shardings_pick_divisible_axis():
    mesh = make_mesh(8, 1)
    params = {"w_big": jnp.zeros((64, 512)),     # dim1 512 % 8 == 0
              "w_odd": jnp.zeros((63, 257)),     # nothing divisible
              "b_small": jnp.zeros((512,))}      # below min_size
    sh = fsdp_shardings(params, mesh, min_size=1024)
    assert sh["w_big"].spec == P(None, "data")
    assert sh["w_odd"].spec == P()
    assert sh["b_small"].spec == P()
    placed = place_params(params, sh)
    # sharded tensor really lives split across devices
    shards = placed["w_big"].addressable_shards
    assert len(shards) == 8 and shards[0].data.shape == (64, 64)


def test_fsdp_training_matches_replicated(rng):
    mesh = make_mesh(8, 1)
    x = jnp.asarray(rng.normal(size=(16, 32)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(16, 4)), jnp.float32)
    mse = lambda out, t: ((out - t) ** 2).mean()

    def run(param_sharding):
        from tlxcv_tpu.core.init import set_seed

        set_seed(0)
        tr = Trainer(network=MLP(), loss_fn=mse,
                     optimizer=optax.sgd(1e-2), mesh=mesh,
                     param_sharding=param_sharding)
        losses = []
        for _ in range(5):
            (tr.params, tr.state, tr.opt_state, _, loss, _) = tr._train_step(
                tr.params, tr.state, tr.opt_state, tr.ema_params,
                tr._put_batch(x), tr._put_batch(y), jax.random.key(0))
            losses.append(float(loss))
        return tr, losses

    tr_f, losses_f = run("fsdp")
    tr_r, losses_r = run("replicated")
    # fsdp actually sharded the big matrices
    sharded = [k for k, s in tr_f.param_shardings.items() if s.spec != P()]
    assert any("fc2" in k for k in sharded), sharded
    # identical numerics up to collective reassociation
    np.testing.assert_allclose(losses_f, losses_r, rtol=2e-4)
    assert losses_f[-1] < losses_f[0]
    # params stay sharded through the update
    k = sharded[0]
    assert tr_f.params[k].sharding.spec != P()


def test_fsdp_checkpoint_resume_preserves_sharding(rng, tmp_path):
    """restore_checkpoint must re-place params AND opt/EMA state on the
    template shardings: a ZeRO-3 resume that feeds replicated host
    arrays back into the step would silently re-replicate the optimizer
    state (the exact memory the sharding exists to save)."""
    mesh = make_mesh(8, 1)
    x = jnp.asarray(rng.normal(size=(16, 32)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(16, 4)), jnp.float32)
    mse = lambda out, t: ((out - t) ** 2).mean()

    def make():
        from tlxcv_tpu.core.init import set_seed

        set_seed(0)
        return Trainer(network=MLP(), loss_fn=mse,
                       optimizer=optax.adam(1e-2), mesh=mesh,
                       param_sharding="fsdp", ema_decay=0.9)

    def step(tr):
        (tr.params, tr.state, tr.opt_state, tr.ema_params, loss, _
         ) = tr._train_step(tr.params, tr.state, tr.opt_state,
                            tr.ema_params, tr._put_batch(x),
                            tr._put_batch(y), jax.random.key(0))
        tr.step += 1
        return float(loss)

    tr = make()
    for _ in range(3):
        step(tr)
    path = str(tmp_path / "fsdp_ckpt.npz")
    tr.save_checkpoint(path)
    la = [step(tr) for _ in range(2)]  # branch A: uninterrupted

    tr2 = make()
    tr2.restore_checkpoint(path)
    assert tr2.step == 3
    # every restored leaf sits on its template sharding (sharded ones
    # really sharded, adam mu/nu included)
    sharded = [k for k, s in tr2.param_shardings.items() if s.spec != P()]
    k = sharded[0]
    assert tr2.params[k].sharding.spec != P()
    mu = tr2.opt_state[0].mu[k]
    assert mu.sharding.spec != P(), "adam mu lost its ZeRO-3 sharding"
    assert tr2.ema_params[k].sharding.spec != P()
    lb = [step(tr2) for _ in range(2)]  # branch B: resumed
    np.testing.assert_allclose(la, lb, rtol=1e-5)
