"""Checkpoint IO.

Two tiers (SURVEY.md §5.4):

- :func:`save_weights` / :func:`load_weights` — flat npz of the module's
  state_dict (source-compatible with the reference demos'
  ``model.save_weights("model.npz")``).
- :class:`TrainCheckpoint` — full training state (params + opt_state +
  step + BN stats), something the reference never had (its "resume" was
  weights-only).  Plain npz with a pytree manifest; async-friendly.
"""
from __future__ import annotations

import json
import typing as tp

import jax
import numpy as np

from ..core.module import Module, load_state_dict, state_dict


_DTYPE_KEY = "__ml_dtypes__"


def _savable(arrays: dict) -> dict:
    """npz can't round-trip ml_dtypes (bfloat16/fp8 load back as void
    '|V2', silently corrupting the checkpoint): upcast those to f32
    (exact) and record the original dtype in a manifest entry."""
    out, casts = {}, {}
    for k, v in arrays.items():
        a = np.asarray(v)
        if a.dtype.kind == "V":
            casts[k] = a.dtype.name
            a = a.astype(np.float32)
        out[k] = a
    if casts:
        out[_DTYPE_KEY] = np.frombuffer(
            json.dumps(casts).encode(), np.uint8).copy()
    return out


def _restore_dtypes(arrays: dict) -> dict:
    manifest = arrays.pop(_DTYPE_KEY, None)
    if manifest is not None:
        import ml_dtypes

        for k, name in json.loads(bytes(manifest.tobytes()).decode()).items():
            if k in arrays:
                arrays[k] = arrays[k].astype(getattr(ml_dtypes, name))
    return arrays


def save_weights(module: Module, path: str):
    np.savez(path, **_savable(state_dict(module)))


def load_weights(module: Module, path: str, strict: bool = True):
    with np.load(path) as data:
        sd = _restore_dtypes({k: data[k] for k in data.files})
    load_state_dict(module, sd, strict=strict)
    return module


# attach as Module methods (avoids a core->utils import cycle at def time)
def _save(self, path):
    save_weights(self, path)


def _load(self, path, strict=True):
    return load_weights(self, path, strict=strict)


Module.save_weights = _save
Module.load_weights = _load


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = tree
    return out


class TrainCheckpoint:
    """Save/restore (params, state, opt_state, step) as npz + manifest."""

    @staticmethod
    def save(path: str, params, state, opt_state, step: int, extra=None):
        """``extra`` is an optional {name: flat-dict} of additional
        trees (e.g. the Trainer's EMA params)."""
        tree = {"params": params, "state": state}
        if extra:
            tree["extra"] = extra
        flat_p = _flatten(tree)
        leaves, treedef = jax.tree_util.tree_flatten(opt_state)
        arrays = {f"opt/{i}": l for i, l in enumerate(leaves)}
        arrays.update(flat_p)
        arrays["step"] = np.asarray(step)
        np.savez(path, **_savable(arrays))

    @staticmethod
    def restore(path: str, params, state, opt_state, extra=None):
        """Restore into the given templates (shapes/treedefs must match).
        Returns (params, state, opt_state, step) — plus the restored
        ``extra`` dict as a fifth element when ``extra`` is given."""
        with np.load(path) as data:
            arrays = _restore_dtypes({k: data[k] for k in data.files})
        new_params = {k: arrays[f"params/{k}"] for k in params}
        new_state = {k: arrays[f"state/{k}"] for k in state}
        leaves, treedef = jax.tree_util.tree_flatten(opt_state)
        new_leaves = [arrays[f"opt/{i}"] for i in range(len(leaves))]
        new_opt = jax.tree_util.tree_unflatten(treedef, new_leaves)
        step = int(arrays["step"])
        if extra is None:
            return new_params, new_state, new_opt, step
        # tolerate extra keys absent from the file (older checkpoints):
        # missing entries keep the caller's template (live) value
        new_extra = {name: {k: arrays.get(f"extra/{name}/{k}", tree[k])
                            for k in tree}
                     for name, tree in extra.items()}
        return new_params, new_state, new_opt, step, new_extra
