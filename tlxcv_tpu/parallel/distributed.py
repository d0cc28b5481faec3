"""Multi-host (multi-process) distributed entry.

The reference framework is strictly single-process (SURVEY.md §2.10);
this module is the TPU-native scale-out story: `jax.distributed` for the
process group, a global `Mesh` spanning every host's devices, and
`jax.make_array_from_process_local_data` to assemble globally-sharded
batches from per-host shards.  Inside `jit` nothing changes — the same
NamedSharding annotations from `parallel.mesh` now span hosts, and XLA
routes the collectives over ICI within a slice / DCN across slices.

On TPU pods `initialize()` needs no arguments (the runtime provides the
coordinator); for CPU process groups (tests, local smoke) it wires the
gloo collectives backend so cross-process psum/all-gather work.
"""
from __future__ import annotations

import typing as tp

import jax
import numpy as np

__all__ = ["initialize", "is_initialized", "global_mesh", "local_batch_size",
           "global_batch", "sync_global_devices", "assert_replica_synced"]

_INITIALIZED = False


def initialize(coordinator_address: tp.Optional[str] = None,
               num_processes: tp.Optional[int] = None,
               process_id: tp.Optional[int] = None,
               local_device_ids=None) -> None:
    """Join (or create) the multi-host process group.

    - TPU pod slice: call with no arguments on every host; the TPU
      runtime supplies coordinator/topology.
    - Explicit group (CPU smoke tests, custom clusters): pass
      ``coordinator_address="host:port"``, ``num_processes`` and this
      host's ``process_id``.  On the CPU backend the gloo collectives
      implementation is selected automatically (XLA's default CPU
      backend has no cross-process collectives).
    """
    global _INITIALIZED
    if _INITIALIZED:
        return
    # NB: must not touch the backend (jax.devices/default_backend) before
    # jax.distributed.initialize — inspect the *configured* platform only.
    platforms = jax.config.jax_platforms or ""
    if platforms.split(",")[0] == "cpu":
        try:
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        except Exception:  # older jax: flag absent — single-host only
            pass
    kwargs = {}
    if coordinator_address is not None:
        kwargs.update(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    if local_device_ids is not None:
        kwargs.update(local_device_ids=local_device_ids)
    jax.distributed.initialize(**kwargs)
    _INITIALIZED = True


def is_initialized() -> bool:
    return _INITIALIZED


def global_mesh(data: tp.Optional[int] = None, model: int = 1):
    """A (data, model) mesh over ALL processes' devices.  The data axis
    is ordered process-major so each host's local devices hold
    contiguous batch shards (cheap host->device feeding)."""
    from .mesh import Mesh

    devices = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    n = len(devices)
    if data is None:
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def local_batch_size(global_batch_size: int) -> int:
    """This process's share of a globally-sharded batch."""
    assert global_batch_size % jax.process_count() == 0
    return global_batch_size // jax.process_count()


def global_batch(local_batch, mesh, spec=None):
    """Assemble a global jax.Array from THIS process's local shard.

    ``local_batch`` leaves have leading dim = local_batch_size; the
    result is a global array of leading dim = global batch, sharded over
    the mesh's 'data' axis across all hosts."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    def put(x):
        s = spec if spec is not None else (
            P("data") if getattr(x, "ndim", 0) >= 1 else P())
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, s), np.asarray(x))

    return jax.tree_util.tree_map(put, local_batch)


def sync_global_devices(tag: str = "sync") -> None:
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(tag)


def assert_replica_synced(tree, atol: float = 0.0) -> float:
    """Verify every process holds identical values for a replicated tree
    (e.g. params after a DP step).  Returns the max cross-process
    difference of a scalar fingerprint; raises if it exceeds atol."""
    from jax.experimental import multihost_utils

    leaves = jax.tree_util.tree_leaves(tree)
    fp = sum(float(jax.numpy.sum(jax.numpy.abs(x))) for x in leaves)
    all_fp = np.asarray(multihost_utils.process_allgather(
        jax.numpy.asarray(fp)))
    diff = float(np.max(np.abs(all_fp - all_fp[0])))
    if diff > atol:
        raise AssertionError(
            f"replicas diverged: fingerprints {all_fp.tolist()}")
    return diff
