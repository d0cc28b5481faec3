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


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: oracle-battery / multi-minute tests "
        "(deselect with -m 'not slow' for the quick inner loop)")


# Whole modules that dominate suite wall-time (the torch-oracle parity
# battery + end-to-end training loops).  `pytest -m 'not slow'` gives a
# quick regression tier; the full suite stays the nightly bar
# (VERDICT r2 weak #7).
_SLOW_MODULES = ("test_parity_zoo", "test_parity_resnet", "test_parity_ssd",
                 "test_parity_detr", "test_end_to_end", "test_det_zoo",
                 "test_detection_training", "test_mask_rcnn",
                 "test_distillation", "test_fid", "test_pose_landmark")


def pytest_collection_modifyitems(items):
    for item in items:
        name = os.path.basename(str(item.fspath))
        if name.startswith(_SLOW_MODULES):
            item.add_marker(pytest.mark.slow)


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
