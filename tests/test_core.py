"""Core module-system tests: variables, state dicts, pure(), BN state flow."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tlxcv_tpu.nn as nn
from tlxcv_tpu.core import Param, Rngs, pure, split, state_dict, load_state_dict


class TinyNet(nn.Module):
    def __init__(self):
        self.conv = nn.Conv2d(3, 8, 3, stride=1, padding=1)
        self.bn = nn.BatchNorm(8)
        self.drop = nn.Dropout(0.5)
        self.fc = nn.Linear(8, 4)

    def __call__(self, x):
        x = nn.relu(self.bn(self.conv(x)))
        x = jnp.mean(x, axis=(1, 2))
        x = self.drop(x)
        return self.fc(x)


def test_eager_forward():
    net = TinyNet()
    x = jnp.ones((2, 16, 16, 3))
    y = net(x)
    assert y.shape == (2, 4)


def test_state_dict_roundtrip():
    net = TinyNet()
    sd = state_dict(net)
    assert "conv/weight" in sd and "bn/running_mean" in sd
    sd2 = {k: v + 1.0 for k, v in sd.items()}
    load_state_dict(net, sd2)
    assert np.allclose(net.conv.weight.value, sd["conv/weight"] + 1.0)


def test_split_kinds():
    net = TinyNet()
    params, state = split(net)
    assert "conv/weight" in params and "fc/bias" in params
    assert "bn/running_mean" in state and "bn/running_var" in state
    assert not set(params) & set(state)


def test_pure_jit_and_bn_state_update():
    net = TinyNet()
    params, state = split(net)
    fn = jax.jit(pure(net), static_argnames=("training",))
    x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 16, 16, 3)), jnp.float32)

    out_eval, state_eval = fn(params, state, x, training=False)
    assert out_eval.shape == (4, 4)
    # eval mode: BN stats unchanged
    np.testing.assert_allclose(state_eval["bn/running_mean"], state["bn/running_mean"])

    out_tr, state_tr = fn(params, state, x, training=True, rngs=jax.random.key(0))
    assert not np.allclose(state_tr["bn/running_mean"], state["bn/running_mean"])
    # template module unchanged by tracing
    assert not isinstance(net.conv.weight.value, jax.core.Tracer)


def test_pure_grads():
    net = TinyNet()
    params, state = split(net)
    fn = pure(net)
    x = jnp.ones((2, 8, 8, 3))

    def loss(p):
        out, _ = fn(p, state, x, training=False)
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(params)
    assert g["conv/weight"].shape == net.conv.weight.value.shape
    assert float(jnp.abs(g["fc/weight"]).sum()) > 0


def test_dropout_rng():
    d = nn.Dropout(0.5)
    x = jnp.ones((1000,))
    from tlxcv_tpu.core.module import call_context
    with call_context(training=True, rngs=Rngs(jax.random.key(0))):
        y = d(x)
    frac = float((y == 0).mean())
    assert 0.4 < frac < 0.6


def test_num_params():
    net = TinyNet()
    # conv 3*3*3*8 + 8, fc 8*4 + 4, bn 8+8
    assert net.num_params() == 3 * 3 * 3 * 8 + 8 + 8 * 4 + 4 + 16
