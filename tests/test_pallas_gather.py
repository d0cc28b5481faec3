"""Interpret-mode correctness for the Pallas DMA row-gather
(ops/pallas/gather.py) — the RoIAlign hot-op candidate.  Compile/perf
probes run on TPU (demo/object_detection/probe_gather_kernel.py)."""
import jax.numpy as jnp
import numpy as np
import pytest

from tlxcv_tpu.ops.pallas.gather import gather_rows


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("r", [64, 777])  # exact multiple + padded tail
def test_gather_rows_matches_xla(dtype, r):
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(500, 256)), dtype)
    idx = jnp.asarray(rng.integers(0, 500, size=r), jnp.int32)
    out = gather_rows(table, idx, g=64, wave=8, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(table[idx]))


def test_gather_rows_repeated_and_boundary_indices():
    table = jnp.arange(100 * 128, dtype=jnp.float32).reshape(100, 128)
    idx = jnp.asarray([0, 99, 0, 99, 50, 50, 1, 98], jnp.int32)
    out = gather_rows(table, idx, g=8, wave=2, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(table[idx]))
