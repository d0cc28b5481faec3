"""Test config: run everything on a virtual 8-device CPU mesh.

The TPU-native answer to "test distributed without a cluster"
(SURVEY.md §4): XLA host-platform virtual devices.

Note: this image's sitecustomize registers the `axon` TPU backend at
interpreter start, so the env-var route (JAX_PLATFORMS) is already
consumed; we must override via jax.config after import instead.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True)
def _reset_init_seed():
    """Weight init draws from core.init's global host RNG; reset it per
    test so every test builds the same weights it would standalone —
    without this, tests that train to an accuracy bar fail depending on
    how many models earlier tests constructed (order-dependent init)."""
    from tlxcv_tpu.core import init as I

    I.set_seed(0)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Free compiled executables (and their baked-in constants) between
    test modules: the suite otherwise accumulates tens of GB of live
    XLA buffers across ~30 modules and hits the 66 GB commit limit with
    a C++ bad_alloc (SIGABRT) late in the run."""
    yield
    jax.clear_caches()
