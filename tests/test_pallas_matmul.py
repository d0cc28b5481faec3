"""Interpret-mode parity for the Pallas int8 matmul (exact int32)."""
import jax.numpy as jnp
import numpy as np
import pytest

from tlxcv_tpu.ops.pallas.matmul import int8_matmul


@pytest.mark.parametrize("m,k,n,bm,bn,bk", [
    (256, 256, 256, 128, 128, 128),
    (300, 200, 130, 128, 128, 128),   # padded, uneven
    (512, 1024, 384, 256, 128, 512),  # rectangular blocks
])
def test_int8_matmul_interpret_exact(rng, m, k, n, bm, bn, bk):
    a = rng.integers(-127, 128, size=(m, k)).astype(np.int8)
    b = rng.integers(-127, 128, size=(k, n)).astype(np.int8)
    out = int8_matmul(jnp.asarray(a), jnp.asarray(b), block_m=bm,
                      block_n=bn, block_k=bk, interpret=True)
    ref = a.astype(np.int32) @ b.astype(np.int32)
    assert out.dtype == jnp.int32
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_int8_matmul_rejects_float(rng):
    a = jnp.asarray(rng.normal(size=(128, 128)), jnp.float32)
    with pytest.raises(TypeError):
        int8_matmul(a, a.astype(jnp.float32))
