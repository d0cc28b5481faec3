"""Mesh / sharding layer — the framework's distributed story.

The reference is strictly single-process single-device (SURVEY.md §2.10);
this layer is new capability: one `jax.sharding.Mesh` over ICI/DCN with

- **data** axis: batch sharding for training/inference fan-out (DP),
- **model** axis: optional tensor-parallel sharding of wide layers (TP).

Everything goes through `jax.jit` + `NamedSharding`; XLA inserts the
psum/all-gather collectives (scaling-book recipe: annotate, compile,
profile).  Multi-host entry is `jax.distributed.initialize` by the
caller; this module is topology-agnostic.
"""
from __future__ import annotations

import typing as tp

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_DEFAULT_MESH: tp.Optional[Mesh] = None


def make_mesh(data: int | None = None, model: int = 1,
              devices=None) -> Mesh:
    """Build a (data, model) mesh.  data=None uses all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // model
    assert data * model <= n, f"mesh {data}x{model} > {n} devices"
    arr = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def get_mesh(mesh: tp.Optional[Mesh] = None) -> Mesh:
    global _DEFAULT_MESH
    if mesh is not None:
        return mesh
    if _DEFAULT_MESH is None:
        _DEFAULT_MESH = make_mesh()
    return _DEFAULT_MESH


def set_default_mesh(mesh: Mesh):
    global _DEFAULT_MESH
    _DEFAULT_MESH = mesh


def shard_batch(batch, mesh: tp.Optional[Mesh] = None):
    """Place a host batch with the leading dim sharded over 'data'."""
    mesh = get_mesh(mesh)
    def put(x):
        spec = P("data") if getattr(x, "ndim", 0) >= 1 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map(put, batch)


def shard_params(params, mesh: tp.Optional[Mesh] = None, rules=None):
    """Replicate params (or apply `rules`: list of (path-substring, spec))."""
    mesh = get_mesh(mesh)

    def place(path, x):
        spec = P()
        if rules:
            for substr, s in rules:
                if substr in path:
                    spec = s
                    break
        return jax.device_put(x, NamedSharding(mesh, spec))

    if isinstance(params, dict):
        return {k: place(k, v) for k, v in params.items()}
    return jax.tree_util.tree_map(lambda x: place("", x), params)


def data_parallel_shardings(mesh: tp.Optional[Mesh] = None):
    """(replicated, batch-sharded) NamedShardings for jit annotations."""
    mesh = get_mesh(mesh)
    return NamedSharding(mesh, P()), NamedSharding(mesh, P("data"))


def fsdp_shardings(params: dict, mesh: tp.Optional[Mesh] = None,
                   axis: str = "data", min_size: int = 2 ** 14):
    """ZeRO-3-style per-parameter shardings: each tensor is sharded along
    its LARGEST dimension divisible by the mesh axis; tensors smaller
    than `min_size` elements stay replicated (sharding tiny biases costs
    more in collective latency than it saves in HBM).

    Under ``jax.jit`` this is the whole FSDP implementation: parameters
    enter the step sharded, XLA inserts the all-gather at each use site
    and the reduce-scatter on the mirrored gradients, and the
    (elementwise) optimizer update stays sharded — the scaling-book
    recipe, no wrapper classes.

    Returns {path: NamedSharding}; use :func:`place_params` to apply.
    """
    mesh = get_mesh(mesh)
    n = mesh.shape[axis]
    out = {}
    for k, v in params.items():
        shape = getattr(v, "shape", ())
        size = int(np.prod(shape)) if shape else 0
        spec = P()
        if size >= min_size and n > 1:
            dims = [(d, s) for d, s in enumerate(shape) if s % n == 0]
            if dims:
                d = max(dims, key=lambda t: t[1])[0]
                spec = P(*([None] * d + [axis]))
        out[k] = NamedSharding(mesh, spec)
    return out


def place_params(params: dict, shardings: dict):
    """device_put each param onto its sharding (host->sharded HBM)."""
    return {k: jax.device_put(v, shardings[k]) for k, v in params.items()}
