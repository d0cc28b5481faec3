"""AOT serving export: model -> self-contained StableHLO artifact.

The reference framework has no deployment story beyond "load the Python
model and call it" (its demos re-instantiate the model class for
inference).  On TPU the natural production artifact is an AOT-exported
StableHLO function: weights baked in as constants, no Python model code
needed at serving time, loadable from any JAX (or PjRt C++) host.

    art = export_model(model, (224, 224, 3))         # polymorphic batch
    save_exported("resnet50.stablehlo", art)
    ...
    serve = load_exported("resnet50.stablehlo")      # -> callable
    logits = serve(images)                           # any batch size

Quantized models export the same way (int8 weights + scales are baked
constants), and `platforms=("tpu", "cpu")` produces one artifact that
runs on both.
"""
from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
from jax import export as jexport

from ..core.module import pure, split

__all__ = ["export_model", "save_exported", "load_exported"]


def export_model(model, input_shape: tp.Sequence[int], *,
                 batch: tp.Union[str, int, None] = "b",
                 dtype=jnp.float32, method: str = "__call__",
                 platforms: tp.Optional[tp.Sequence[str]] = None,
                 extra_specs: tp.Sequence[jax.ShapeDtypeStruct] = (),
                 sharding=None):
    """Export ``model.method`` with params/state baked in.

    ``input_shape`` is the per-example shape (H, W, C); ``batch`` is a
    symbolic-dimension name (default ``"b"`` — the artifact accepts any
    batch size) or a concrete int for a fixed-batch artifact.
    ``platforms`` lowers for specific backends (e.g. ``("tpu", "cpu")``);
    default is the current backend.  ``sharding`` (a ``NamedSharding``,
    e.g. batch over a mesh 'data' axis) exports a MULTI-DEVICE serving
    artifact — the mesh topology and collectives serialize with it;
    requires a concrete ``batch``.  Returns a ``jax.export.Exported``.
    """
    params, state = split(model)
    fwd = pure(model, method)

    def serve_fn(x, *extra):
        out, _ = fwd(params, state, x, *extra, training=False)
        return out

    if isinstance(batch, str):
        if sharding is not None:
            raise ValueError("sharded export needs a concrete batch size")
        bdim = jexport.symbolic_shape(batch)[0]
    else:
        bdim = int(batch) if batch is not None else 1
    spec = jax.ShapeDtypeStruct((bdim, *input_shape), dtype,
                                sharding=sharding)
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    jit_kwargs = {} if sharding is None else {"in_shardings": sharding}
    return jexport.export(jax.jit(serve_fn, **jit_kwargs),
                          **kwargs)(spec, *extra_specs)


def save_exported(path: str, exported) -> int:
    """Serialize an ``Exported`` to disk; returns the byte size."""
    blob = exported.serialize()
    with open(path, "wb") as f:
        f.write(blob)
    return len(blob)


def load_exported(path: str):
    """Load a serialized artifact; returns ``fn(x) -> out`` (jittable,
    no model code required)."""
    with open(path, "rb") as f:
        blob = f.read()
    exported = jexport.deserialize(bytearray(blob))
    return exported.call
