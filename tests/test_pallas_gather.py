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


def test_multilevel_roi_align_pallas_gather_path_matches_default():
    import jax.numpy as jnp

    from tlxcv_tpu.ops.roi_align import multilevel_roi_align

    rng = np.random.default_rng(0)
    feats = [jnp.asarray(rng.normal(size=(2, hw, hw, 8)), jnp.float32)
             for hw in (32, 16, 8, 4)]
    lo = jnp.asarray(rng.uniform(2, 80, size=(2, 6, 2)), jnp.float32)
    wh = jnp.asarray(rng.uniform(4, 40, size=(2, 6, 2)), jnp.float32)
    boxes = jnp.concatenate([lo, lo + wh], -1)
    a = multilevel_roi_align(feats, boxes, output_size=7, sampling_ratio=2)
    b = multilevel_roi_align(feats, boxes, output_size=7, sampling_ratio=2,
                             gather_impl="pallas", _interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("r,g", [(64, 8), (77, 8), (48, 16)])
def test_gather_rows_bs_matches_xla(r, g):
    """BlockSpec-index-map formulation (VERDICT r4 #8 retry)."""
    from tlxcv_tpu.ops.pallas.gather import gather_rows_bs

    rng = np.random.default_rng(1)
    table = jnp.asarray(rng.normal(size=(300, 256)), jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, 300, size=r), jnp.int32)
    out = gather_rows_bs(table, idx, g=g, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(table[idx]))


def test_multilevel_roi_align_pallas_bs_path_matches_default():
    from tlxcv_tpu.ops.roi_align import multilevel_roi_align

    rng = np.random.default_rng(2)
    feats = [jnp.asarray(rng.normal(size=(2, hw, hw, 8)), jnp.float32)
             for hw in (32, 16, 8, 4)]
    lo = jnp.asarray(rng.uniform(2, 80, size=(2, 6, 2)), jnp.float32)
    wh = jnp.asarray(rng.uniform(4, 40, size=(2, 6, 2)), jnp.float32)
    boxes = jnp.concatenate([lo, lo + wh], -1)
    a = multilevel_roi_align(feats, boxes, output_size=7, sampling_ratio=1)
    b = multilevel_roi_align(feats, boxes, output_size=7, sampling_ratio=1,
                             gather_impl="pallas_bs", _interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5,
                               atol=2e-5)
