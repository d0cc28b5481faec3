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
    if os.environ.get("RECORD_SUITE"):
        # capture the SHA at session START: collection imports the tree
        # as it exists now, so a commit landing during the (long) run
        # must not be attributed to the record (suite-currency honesty)
        import subprocess
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        config._record_suite_sha = subprocess.run(
            ["git", "rev-parse", "HEAD"], capture_output=True, text=True,
            cwd=repo).stdout.strip()


def pytest_terminal_summary(terminalreporter, exitstatus, config):
    """Suite-currency record (VERDICT r4 #7): a full-suite run launched
    with RECORD_SUITE=1 writes tests/suite_record.json (git SHA + date +
    counts); test_suite_record.py gates that the committed record is
    green and within a few commits of HEAD, so a round can no longer
    close with its last commits unexercised."""
    if not os.environ.get("RECORD_SUITE"):
        return
    import datetime
    import json
    import subprocess
    import time as _time

    start = getattr(terminalreporter, "_sessionstarttime", None)
    if start is None:  # pytest >= 8 renamed it
        start = getattr(terminalreporter, "_session_start", None)
        start = getattr(start, "time", None) if start is not None else None
    stats = terminalreporter.stats
    counts = {k: len(stats.get(k, []))
              for k in ("passed", "failed", "error", "skipped",
                        "deselected")}
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def git(*args):
        return subprocess.run(["git", *args], capture_output=True,
                              text=True, cwd=repo).stdout.strip()

    rec = {
        "sha": (getattr(config, "_record_suite_sha", "")
                or git("rev-parse", "HEAD")),
        "dirty": bool(git("status", "--porcelain")),
        "date": datetime.datetime.now(datetime.timezone.utc)
        .strftime("%Y-%m-%dT%H:%M:%SZ"),
        "exitstatus": int(exitstatus),
        "duration_s": (round(_time.time() - start, 1)
                       if isinstance(start, float) else None),
        **counts,
    }
    path = os.path.join(repo, "tests", "suite_record.json")
    with open(path, "w") as f:
        json.dump(rec, f, indent=1)
    terminalreporter.write_line(f"suite_record.json written: {rec}")


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
