"""Pattern-based sub-layer access / surgery (reference
tlxcv/models/classification/ops/theseus_layer.py:23-60 TheseusLayer —
PaddleClas' mechanism for feature extraction and sublayer replacement).

Because modules here are plain Python objects, surgery is direct
attribute rewriting — no hook registry needed.
"""
from __future__ import annotations

import fnmatch
import typing as tp

from ..core.module import Module

__all__ = ["named_modules", "get_by_path", "upgrade_sublayer",
           "FeatureRecorder", "record_features"]


def named_modules(module: Module):
    """Iterate (path, module) pairs, '/'-separated paths."""
    yield from module.modules()


def get_by_path(module: Module, path: str):
    """Fetch a submodule / container element by '/'-separated path."""
    obj = module
    for part in path.split("/"):
        if not part:
            continue
        if isinstance(obj, (list, tuple)):
            obj = obj[int(part)]
        elif isinstance(obj, dict):
            obj = obj[part]
        else:
            obj = getattr(obj, part)
    return obj


def _set_by_path(module, path, value):
    parts = [p for p in path.split("/") if p]
    parent = get_by_path(module, "/".join(parts[:-1])) if len(parts) > 1 else module
    last = parts[-1]
    if isinstance(parent, list):
        parent[int(last)] = value
    elif isinstance(parent, dict):
        parent[last] = value
    else:
        setattr(parent, last, value)


def upgrade_sublayer(module: Module, pattern: str,
                     replace_fn: tp.Callable[[Module], Module]):
    """Replace every submodule whose path matches the glob ``pattern``
    with ``replace_fn(old)`` (reference TheseusLayer.upgrade_sublayer)."""
    hits = [p for p, m in module.modules()
            if p and fnmatch.fnmatch(p, pattern)]
    for p in hits:
        _set_by_path(module, p, replace_fn(get_by_path(module, p)))
    return hits


class FeatureRecorder(Module):
    """Transparent wrapper that stores its submodule's output."""

    def __init__(self, inner: Module, store: dict, key: str):
        self.inner = inner
        self._m_cache_store = store  # excluded from module traversal
        self._m_cache_key = key

    def __call__(self, *args, **kwargs):
        out = self.inner(*args, **kwargs)
        self._m_cache_store[self._m_cache_key] = out
        return out


def record_features(module: Module, patterns: tp.Sequence[str]):
    """Wrap matching submodules so forward passes record their outputs.

    Returns the store dict; after any call, store[path] holds that
    sublayer's most recent output (works inside jit — the stored values
    are traced alongside and returned if you fetch them inside the same
    traced function).
    """
    store: dict = {}
    for pattern in patterns:
        hits = [p for p, m in module.modules()
                if p and fnmatch.fnmatch(p, pattern)]
        for p in hits:
            inner = get_by_path(module, p)
            _set_by_path(module, p, FeatureRecorder(inner, store, p))
    return store
