"""Space-to-depth stem rewrite (ops/space_to_depth.py): exactness and
int8-pipeline compatibility.

No reference counterpart — this is a TPU serving-path optimization (the
7x7/2 stem maps onto the MXU at ~3% of peak; the s2d rewrite is the
standard MLPerf-ResNet fix). The contract tested here is bit-level
equivalence, so everything downstream (quant calibration, accuracy
bars) is untouched by construction.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tlxcv_tpu import nn
from tlxcv_tpu.core import pure, split
from tlxcv_tpu.models import resnet18
from tlxcv_tpu.ops.space_to_depth import (SpaceToDepthStem,
                                          convert_stem_to_space_to_depth)


@pytest.mark.parametrize("hw", [(64, 64), (57, 63), (224, 224)])
def test_stem_rewrite_is_exact(rng, hw):
    h, w = hw
    conv = nn.Conv2d(3, 16, 7, stride=2, padding=3, bias=True)
    conv.weight.value = jnp.asarray(rng.normal(size=(7, 7, 3, 16)) * 0.1,
                                    jnp.float32)
    conv.bias.value = jnp.asarray(rng.normal(size=(16,)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(2, h, w, 3)), jnp.float32)
    ref = conv(x)

    s2d = SpaceToDepthStem(conv)
    out = s2d(x)
    assert out.shape == ref.shape
    # the remapping is a permutation of the identical multiply-adds per
    # output element, so it is numerically tight (not just "close")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_stem_rewrite_rejects_non_stem_convs():
    with pytest.raises(ValueError, match="not a 7x7/2"):
        SpaceToDepthStem(nn.Conv2d(3, 16, 3, stride=2, padding=1))
    with pytest.raises(ValueError, match="not a 7x7/2"):
        SpaceToDepthStem(nn.Conv2d(3, 16, 7, stride=1, padding=3))
    c = nn.Conv2d(3, 16, 7, stride=2, padding=3)
    c.weight.value = c.weight.value.astype(jnp.int8)
    with pytest.raises(ValueError, match="BEFORE quantization"):
        SpaceToDepthStem(c)


def test_resnet_conversion_preserves_forward(rng):
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
    m = resnet18(num_classes=10)
    p, s = split(m)
    ref, _ = pure(m)(p, s, x)

    convert_stem_to_space_to_depth(m)
    assert isinstance(m.conv1, SpaceToDepthStem)
    # idempotent
    convert_stem_to_space_to_depth(m)
    p2, s2 = split(m)
    out, _ = jax.jit(lambda pp, ss, v: pure(m)(pp, ss, v))(p2, s2, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_converted_stem_survives_int8_serving_pipeline(rng):
    """fold_batchnorm + quantize + calibrate + fuse_requantize must keep
    working through the wrapped stem (the (4,2) padding trick exists
    precisely so no slice breaks the conv->BN trace adjacency)."""
    from tlxcv_tpu.ops.quant import quantize_for_serving

    x = np.asarray(rng.normal(size=(4, 64, 64, 3)), np.float32)
    m = resnet18(num_classes=10)
    p, s = split(m)
    ref, _ = pure(m)(p, s, jnp.asarray(x))

    convert_stem_to_space_to_depth(m)
    n_fold, n_q, n_cal, n_fuse = quantize_for_serving(m, [x])
    # the stem conv itself was folded AND quantized (not skipped)
    assert m.conv1.conv.weight.value.dtype == jnp.int8
    assert m.conv1.conv.bias is not None  # BN folded into it
    assert n_fold == 20 and n_q == 21 and n_fuse > 0
    p8, s8 = split(m)
    out, _ = jax.jit(lambda pp, ss, v: pure(m)(pp, ss, v))(
        p8, s8, jnp.asarray(x))
    cos = float((ref * out).sum() /
                (jnp.linalg.norm(ref) * jnp.linalg.norm(out) + 1e-12))
    assert cos > 0.99
