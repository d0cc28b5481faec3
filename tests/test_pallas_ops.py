"""Pallas / MXU fast-path ops vs the reference interpolate."""
import jax
import jax.numpy as jnp
import numpy as np

from tlxcv_tpu.ops.image import interpolate
from tlxcv_tpu.ops.pallas import (upsample2x_bilinear,
                                  upsample2x_fused,
                                  upsample2x_matmul)


def test_pallas_upsample_interpret_exact(rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 16, 8)), jnp.float32)
    ref = interpolate(x, scale_factor=2, mode="bilinear", fast_path=False)
    out = upsample2x_bilinear(x, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_matmul_upsample_exact_f32(rng):
    x = jnp.asarray(rng.normal(size=(2, 13, 9, 4)), jnp.float32)
    ref = interpolate(x, scale_factor=2, mode="bilinear", fast_path=False)
    out = upsample2x_matmul(x, precision="highest")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_fused_upsample_interpret_exact_and_grad(rng):
    """The production Pallas kernel (2D-matmul formulation that compiles
    on the real TPU): forward matches the gather reference; the custom
    VJP matches the einsum path's gradient."""
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 128)), jnp.float32)
    ref = interpolate(x, scale_factor=2, mode="bilinear", fast_path=False)
    out = upsample2x_fused(x, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    g1 = jax.grad(lambda v: (upsample2x_fused(v, interpret=True) ** 2).sum())(x)
    g2 = jax.grad(lambda v: (upsample2x_matmul(v) ** 2).sum())(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4)


def test_interpolate_2x_fast_path_matches_reference(rng):
    """ops.interpolate now routes exact-2x bilinear to the MXU/Pallas
    fast path by default — numerics must stay identical to the gather
    formulation."""
    x = jnp.asarray(rng.normal(size=(2, 10, 14, 32)), jnp.float32)
    fast = interpolate(x, scale_factor=2, mode="bilinear")
    ref = interpolate(x, scale_factor=2, mode="bilinear", fast_path=False)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref), atol=1e-5)
