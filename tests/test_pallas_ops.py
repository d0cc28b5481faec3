"""Pallas / MXU fast-path ops vs the reference interpolate."""
import jax
import jax.numpy as jnp
import numpy as np

from tlxcv_tpu.ops.image import interpolate
from tlxcv_tpu.ops.pallas import upsample2x_bilinear, upsample2x_matmul


def test_pallas_upsample_interpret_exact(rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 16, 8)), jnp.float32)
    ref = interpolate(x, scale_factor=2, mode="bilinear")
    out = upsample2x_bilinear(x, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_matmul_upsample_exact_f32(rng):
    x = jnp.asarray(rng.normal(size=(2, 13, 9, 4)), jnp.float32)
    ref = interpolate(x, scale_factor=2, mode="bilinear")
    out = upsample2x_matmul(x, precision="highest")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
