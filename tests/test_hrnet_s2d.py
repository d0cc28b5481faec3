"""convert_hrnet_branches_to_s2d is eval-exact: blocked branches (3x3
kernel remap + tiled BN) must reproduce the original HRNet features to
fp32 rounding, across all three pack choices (2x2 on 16/18ch, 2x2 on
32ch, 2x1 on 64ch, unchanged at >=128ch — hrnet_w18_small_v1 hits all
four)."""
import numpy as np
import pytest

import jax.numpy as jnp

from tlxcv_tpu.models.backbones.hrnet import (SpaceToDepthBranch,
                                              convert_hrnet_branches_to_s2d,
                                              hrnet_w18_small_v1)
from tlxcv_tpu.ops.space_to_depth import (block_space_to_depth,
                                          remap_conv3x3_s1,
                                          unblock_space_to_depth)


def test_remap_conv3x3_pack_variants():
    from jax import lax

    rng = np.random.default_rng(0)
    for ph, pw, c in ((2, 2, 5), (2, 1, 6), (4, 2, 3)):
        x = jnp.asarray(rng.normal(size=(2, 8 * ph, 8 * pw, c))
                        .astype(np.float32))
        w = rng.normal(size=(3, 3, c, c)).astype(np.float32) * 0.2
        dn = ("NHWC", "HWIO", "NHWC")
        ref = lax.conv_general_dilated(x, jnp.asarray(w), (1, 1), "SAME",
                                       dimension_numbers=dn)
        z = block_space_to_depth(x, ph, pw)
        zy = lax.conv_general_dilated(
            z, jnp.asarray(remap_conv3x3_s1(w, ph, pw)), (1, 1), "SAME",
            dimension_numbers=dn)
        got = unblock_space_to_depth(zy, ph, pw, c)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-4, rtol=1e-4)


def test_hrnet_s2d_eval_exact():
    m = hrnet_w18_small_v1()
    x = jnp.asarray(np.random.default_rng(1).normal(
        size=(2, 64, 64, 3)).astype(np.float32))
    ref = [np.asarray(o) for o in m(x)]
    n = convert_hrnet_branches_to_s2d(m)
    assert n > 0
    got = m(x)
    assert any(isinstance(b, SpaceToDepthBranch)
               for mod in m.modules()
               for b in getattr(mod[1], "branches", []))
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), r, atol=5e-4, rtol=1e-3)


def test_hrnet_s2d_refuses_training():
    m = hrnet_w18_small_v1()
    convert_hrnet_branches_to_s2d(m)
    x = jnp.asarray(np.zeros((1, 64, 64, 3), np.float32))
    with pytest.raises(RuntimeError):
        with m.train():
            m(x)


def test_hrnet_s2d_composes_with_quantize_for_serving():
    # the MIGRATING.md claim: apply the layout transform BEFORE
    # quantize_for_serving — blocked ConvBNReLU shells must fold/quant
    from tlxcv_tpu.ops.quant import quantize_for_serving

    m = hrnet_w18_small_v1()
    fwd = m.concat_features  # single-output head over the 4 branches
    x = np.random.default_rng(3).normal(size=(1, 32, 32, 3)) \
        .astype(np.float32)
    ref = np.asarray(fwd(jnp.asarray(x)))
    n = convert_hrnet_branches_to_s2d(m)
    assert n > 0
    quantize_for_serving(m, [x], forward=fwd)
    out = np.asarray(fwd(jnp.asarray(x)))
    cos = float(np.dot(ref.ravel(), out.ravel())
                / (np.linalg.norm(ref) * np.linalg.norm(out) + 1e-9))
    assert cos > 0.98, cos
