"""TPU-native module system: plain-Python modules over JAX pytrees.

Design (replaces TensorLayerX's ``tlx.nn.Module`` multi-backend dispatch,
reference ``tlxcv`` L1 layer, SURVEY.md §1):

- A :class:`Module` is a plain Python object whose array-valued leaves are
  wrapped in :class:`Variable` boxes (:class:`Param` for trainables,
  :class:`BatchStat` for BN running stats, :class:`Cache` for inference
  caches such as autoregressive KV caches).
- Nothing here is a pytree by itself.  Instead, :func:`state_dict` /
  :func:`load_state_dict` convert a module tree to/from flat
  ``{path: array}`` dicts (which *are* pytrees), and :func:`pure` wraps a
  module method into a pure function ``fn(params, state, *args) ->
  (out, new_state)`` suitable for ``jax.jit`` / ``pjit``.
- One backend (XLA), one layout (NHWC), one dtype policy.  There is no
  ``TL_BACKEND`` switch and no ``data_format`` duality.

The "bind traced values into the live objects, run, collect, restore"
trick costs nothing at runtime: it only happens while JAX traces.
"""
from __future__ import annotations

import contextlib
import threading
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------------------
# Variables
# --------------------------------------------------------------------------
class Variable:
    """A mutable box holding one array leaf of a module."""

    __slots__ = ("value",)

    def __init__(self, value):
        self.value = value

    def __repr__(self):
        v = self.value
        if hasattr(v, "shape"):
            return f"{type(self).__name__}(shape={tuple(v.shape)}, dtype={v.dtype})"
        return f"{type(self).__name__}({v!r})"


class Param(Variable):
    """Trainable parameter (updated by the optimizer)."""


class BatchStat(Variable):
    """Non-trainable running statistic (e.g. BatchNorm mean/var)."""


class Cache(Variable):
    """Mutable inference-time cache (e.g. autoregressive KV cache)."""


# --------------------------------------------------------------------------
# Call context: training flag + RNG streams, visible to all modules during
# a single (traced) forward call.
# --------------------------------------------------------------------------
class Rngs:
    """Splittable RNG streams keyed by name (``rngs.next('dropout')``)."""

    def __init__(self, key: tp.Optional[jax.Array] = None, **named):
        self._keys: dict[str, jax.Array] = {}
        if key is not None:
            self._keys["default"] = key
        for k, v in named.items():
            self._keys[k] = v

    def next(self, name: str = "default") -> jax.Array:
        key = self._keys.get(name)
        if key is None:
            key = self._keys.get("default")
        if key is None:
            raise ValueError(
                f"No RNG stream '{name}' available; pass rngs= to the pure call."
            )
        key, sub = jax.random.split(key)
        if name in self._keys:
            self._keys[name] = key
        else:
            self._keys["default"] = key
        return sub


class _Ctx(threading.local):
    def __init__(self):
        self.training = False
        self.rngs: tp.Optional[Rngs] = None


_ctx = _Ctx()


def is_training() -> bool:
    return _ctx.training


def rng(name: str = "default") -> jax.Array:
    if _ctx.rngs is None:
        raise ValueError(
            "RNG requested (dropout/droppath/noise) but no rngs were provided. "
            "Pass rngs=Rngs(key) or a jax key to the pure call / Module.__call__."
        )
    return _ctx.rngs.next(name)


def has_rng() -> bool:
    return _ctx.rngs is not None


@contextlib.contextmanager
def call_context(training: bool = False, rngs: tp.Optional[Rngs] = None):
    prev_t, prev_r = _ctx.training, _ctx.rngs
    _ctx.training, _ctx.rngs = training, rngs
    try:
        yield
    finally:
        _ctx.training, _ctx.rngs = prev_t, prev_r


# --------------------------------------------------------------------------
# Module base
# --------------------------------------------------------------------------
class Module:
    """Base class for all layers and models.

    Subclasses define parameters in ``__init__`` (as :class:`Param` /
    :class:`BatchStat` boxes, usually via the layer library) and implement
    ``__call__``.  Calling a module directly works eagerly; for compiled
    training/inference use :func:`pure` or the Trainer.
    """

    def __call__(self, *args, **kwargs):  # pragma: no cover - abstract
        raise NotImplementedError

    # -- convenience ------------------------------------------------------
    def state_dict(self, kind: tp.Optional[type] = None) -> dict[str, jax.Array]:
        return state_dict(self, kind)

    def load_state_dict(self, d: tp.Mapping[str, tp.Any], strict: bool = True):
        return load_state_dict(self, d, strict=strict)

    def variables(self, kind: tp.Optional[type] = None):
        yield from iter_variables(self, kind)

    def num_params(self) -> int:
        return sum(int(np.prod(v.value.shape)) for _, v in self.variables(Param))

    def modules(self):
        """Iterate (path, module) over self and all submodules."""
        yield from _iter_modules("", self)

    def train(self):
        """Eager-mode helper: run subsequent direct calls in training mode."""
        return call_context(training=True)

    def __repr__(self):
        n = sum(1 for _ in self.variables(Param))
        return f"{type(self).__name__}(params={n})"


def _iter_modules(prefix: str, obj):
    if isinstance(obj, Module):
        yield prefix, obj
        for name, child in vars(obj).items():
            if name.startswith("_m_cache"):
                continue
            yield from _iter_modules(f"{prefix}/{name}" if prefix else name, child)
    elif isinstance(obj, (list, tuple)):
        for i, child in enumerate(obj):
            yield from _iter_modules(f"{prefix}/{i}", child)
    elif isinstance(obj, dict):
        for k, child in obj.items():
            yield from _iter_modules(f"{prefix}/{k}", child)


def iter_variables(obj, kind: tp.Optional[type] = None, prefix: str = ""):
    """Yield ``(path, Variable)`` in deterministic (definition) order."""
    if isinstance(obj, Variable):
        if kind is None or isinstance(obj, kind):
            yield prefix, obj
    elif isinstance(obj, Module):
        for name, child in vars(obj).items():
            yield from iter_variables(
                child, kind, f"{prefix}/{name}" if prefix else name
            )
    elif isinstance(obj, (list, tuple)):
        for i, child in enumerate(obj):
            yield from iter_variables(child, kind, f"{prefix}/{i}" if prefix else str(i))
    elif isinstance(obj, dict):
        for k, child in obj.items():
            yield from iter_variables(child, kind, f"{prefix}/{k}" if prefix else str(k))


# --------------------------------------------------------------------------
# state_dict / load_state_dict
# --------------------------------------------------------------------------
def state_dict(module, kind: tp.Optional[type] = None) -> dict[str, jax.Array]:
    """Flatten a module tree to ``{path: array}``. ``kind`` filters by
    Variable subclass (Param / BatchStat / Cache); None takes everything."""
    return {path: v.value for path, v in iter_variables(module, kind)}


def load_state_dict(module, d: tp.Mapping[str, tp.Any], strict: bool = True):
    """Write arrays from ``d`` back into the module's Variable boxes."""
    seen = set()
    uncovered = []
    for path, v in iter_variables(module):
        if path in d:
            v.value = d[path]
            seen.add(path)
        else:
            uncovered.append(path)
    if strict:
        missing = set(d) - seen
        if missing:
            raise KeyError(f"load_state_dict: {len(missing)} unmatched keys, e.g. "
                           f"{sorted(missing)[:5]}")
        if uncovered and d:
            # torch strict semantics: a checkpoint that covers only part
            # of the model must raise, not leave random init in place
            raise KeyError(
                f"load_state_dict: {len(uncovered)} module variables not "
                f"in the checkpoint, e.g. {uncovered[:5]}")
    return module


def split(module) -> tuple[dict[str, jax.Array], dict[str, jax.Array]]:
    """Split into (params, state) where state = BatchStats + Caches."""
    params, state = {}, {}
    for path, v in iter_variables(module):
        (params if isinstance(v, Param) else state)[path] = v.value
    return params, state


# --------------------------------------------------------------------------
# pure(): module method -> pure jittable function
# --------------------------------------------------------------------------
def pure(module: Module, method: tp.Union[str, tp.Callable] = "__call__"):
    """Wrap ``module.method`` as a pure function.

    ``method`` is a method name or a callable ``fn(module, *args, **kw)``.
    Returns ``fn(params, state, *args, training=False, rngs=None, **kw)
    -> (out, new_state)``.  ``params``/``state`` are flat path dicts as
    produced by :func:`split`.  The live module object is used as a
    structural template: traced values are bound into its Variable boxes
    for the duration of the call and the originals restored afterwards.
    """
    fn = getattr(type(module), method) if isinstance(method, str) else method
    var_list = list(iter_variables(module))
    var_map = dict(var_list)

    def wrapped(params, state, *args, training: bool = False, rngs=None, **kwargs):
        if rngs is not None and not isinstance(rngs, Rngs):
            rngs = Rngs(rngs)
        originals = {p: v.value for p, v in var_list}
        try:
            for p, v in var_list:
                if p in params:
                    v.value = params[p]
                elif p in state:
                    v.value = state[p]
            with call_context(training=training, rngs=rngs):
                out = fn(module, *args, **kwargs)
            new_state = {
                p: var_map[p].value for p in state
            }
        finally:
            for p, v in var_list:
                v.value = originals[p]
        return out, new_state

    return wrapped
