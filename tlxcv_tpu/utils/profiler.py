"""Tracing / profiling utilities (SURVEY.md §5.1: the reference's only
introspection was wall-clock prints and shelling out to *-smi tools;
here: jax.profiler traces + fetch-true timing that works on the axon
relay, where block_until_ready returns early)."""
from __future__ import annotations

import contextlib
import time
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["trace", "device_info", "benchmark_fn", "Timer"]


@contextlib.contextmanager
def trace(logdir: str = "/tmp/jax-trace"):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def device_info():
    """Replaces the reference's npu-smi/nvidia-smi shell-outs
    (reference demo/human_pose_estimation/train.py:23-40)."""
    devs = jax.devices()
    return {
        "platform": devs[0].platform if devs else "none",
        "device_kind": devs[0].device_kind if devs else "none",
        "num_devices": len(devs),
        "backend": jax.default_backend(),
    }


class Timer:
    def __init__(self):
        self.t0 = time.perf_counter()

    def elapsed(self):
        return time.perf_counter() - self.t0


def benchmark_fn(fn, *args, iters=20, warmup=2, **kwargs):
    """Time a jitted fn with a forced host fetch per batch of iters
    (drains the async pipeline — honest on every backend)."""
    def run_once():
        out = fn(*args, **kwargs)
        leaf = jax.tree_util.tree_leaves(out)[0]
        return float(jnp.sum(leaf))

    for _ in range(warmup):
        run_once()
    t0 = time.perf_counter()
    for _ in range(iters - 1):
        out = fn(*args, **kwargs)
    run_once()
    dt = time.perf_counter() - t0
    return dt / iters
