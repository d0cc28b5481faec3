"""GPipe pipeline parallelism (parallel/pipeline.py) on the virtual
8-device mesh: output equals the serial composition; grads flow through
the ppermute ring."""
import jax
import jax.numpy as jnp
import numpy as np

from tlxcv_tpu.parallel import make_mesh
from tlxcv_tpu.parallel.pipeline import pipeline_apply, stack_stage_params


def _stage_fn(p, x):
    return jnp.tanh(x @ p["w"] + p["b"])


def test_pipeline_matches_serial(rng):
    mesh = make_mesh(2, 4)  # 4 pipeline stages
    d = 16
    stages = [{"w": jnp.asarray(rng.normal(size=(d, d)) * 0.3, jnp.float32),
               "b": jnp.asarray(rng.normal(size=(d,)), jnp.float32)}
              for _ in range(4)]
    stacked = stack_stage_params(stages)
    x = jnp.asarray(rng.normal(size=(16, d)), jnp.float32)
    ref = x
    for p in stages:
        ref = _stage_fn(p, ref)
    out = pipeline_apply(_stage_fn, stacked, x, mesh, axis="model",
                         microbatches=8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_pipeline_grads_flow(rng):
    mesh = make_mesh(4, 2)
    d = 8
    stages = [{"w": jnp.asarray(rng.normal(size=(d, d)) * 0.3, jnp.float32),
               "b": jnp.zeros((d,), jnp.float32)} for _ in range(2)]
    stacked = stack_stage_params(stages)
    x = jnp.asarray(rng.normal(size=(8, d)), jnp.float32)

    @jax.jit
    def loss(s):
        out = pipeline_apply(_stage_fn, s, x, mesh, axis="model",
                             microbatches=4)
        return (out ** 2).mean()

    g = jax.grad(loss)(stacked)
    # every stage's weights get gradient (both leading-axis slices)
    gw = np.asarray(g["w"])
    assert gw.shape[0] == 2
    assert np.abs(gw[0]).max() > 0 and np.abs(gw[1]).max() > 0

    # matches autodiff through the serial composition
    def serial_loss(s):
        y = x
        for i in range(2):
            y = _stage_fn(jax.tree_util.tree_map(lambda a: a[i], s), y)
        return (y ** 2).mean()

    g_ref = jax.grad(serial_loss)(stacked)
    np.testing.assert_allclose(gw, np.asarray(g_ref["w"]), atol=1e-5)


def test_pipeline_rejects_stage_count_mismatch():
    """16 stacked stages on an 8-wide axis would silently skip layers."""
    import numpy as np
    import pytest

    from tlxcv_tpu.parallel import make_mesh

    mesh = make_mesh(1, 8)
    stacked = {"w": jnp.ones((16, 4, 4))}
    x = jnp.ones((8, 4))
    with pytest.raises(AssertionError):
        pipeline_apply(lambda p, a: a @ p["w"], stacked, x, mesh,
                       axis="model", microbatches=4)
