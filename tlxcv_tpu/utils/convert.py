"""Pretrained-weight conversion: torch ``.pth`` / paddle ``.pdparams`` →
framework state dicts (SURVEY.md §2.9 #13 — standalone, no paddle
dependency; read with pickle/numpy).

Layout rules applied automatically by shape:
- conv kernels OIHW → HWIO (torch & paddle),
- torch linear (out, in) → (in, out); paddle linear is already (in, out),
- BN buffer name mapping (`_mean`/`_variance` → running_mean/var).

:func:`convert_by_order` performs the generic alignment used by the
reference's paddle2tlx restore (match parameters in definition order,
transposing when shapes demand it), and :func:`parity_report` is the
per-layer diff harness reproducing the README parity-table methodology
(reference README.md:30-143, SURVEY.md §4.1).
"""
from __future__ import annotations

import io
import pickle
import typing as tp

import numpy as np

__all__ = ["load_torch_weights", "load_pdparams", "convert_array",
           "convert_by_order", "parity_report"]


def load_torch_weights(path):
    """Load a torch checkpoint into {name: numpy} (cpu)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    if "state_dict" in sd and isinstance(sd["state_dict"], dict):
        sd = sd["state_dict"]
    return {k: v.detach().numpy() if hasattr(v, "detach") else np.asarray(v)
            for k, v in sd.items()}


class _PaddleUnpickler(pickle.Unpickler):
    """Best-effort unpickler for paddle.save output without paddle."""

    def find_class(self, module, name):
        if module.startswith("paddle"):
            if name in ("Tensor", "LoDTensor", "DenseTensor"):
                return np.asarray
            return lambda *a, **k: None
        if module == "numpy.core.multiarray" or module.startswith("numpy"):
            return super().find_class(module, name)
        return super().find_class(module, name)


def load_pdparams(path):
    """Load a .pdparams file into {name: numpy}."""
    with open(path, "rb") as f:
        data = f.read()
    sd = _PaddleUnpickler(io.BytesIO(data)).load()
    out = {}
    for k, v in sd.items():
        arr = np.asarray(v)
        if arr.dtype == object:
            continue
        out[k] = arr
    return out


def convert_array(src: np.ndarray, dst_shape: tuple,
                  source: str = "torch") -> tp.Optional[np.ndarray]:
    """Map a source array onto dst_shape, applying layout transposes.

    Returns None if no valid mapping exists.
    """
    src = np.asarray(src)
    if tuple(src.shape) == tuple(dst_shape):
        return src
    if src.ndim == 4 and len(dst_shape) == 4:
        # OIHW -> HWIO
        cand = np.transpose(src, (2, 3, 1, 0))
        if cand.shape == tuple(dst_shape):
            return cand
        # torch convtranspose IOHW -> HWIO
        cand = np.transpose(src, (2, 3, 0, 1))
        if cand.shape == tuple(dst_shape):
            return cand
    if src.ndim == 2 and len(dst_shape) == 2:
        if src.T.shape == tuple(dst_shape):
            return src.T
    if src.ndim == 5 and len(dst_shape) == 5:
        cand = np.transpose(src, (2, 3, 4, 1, 0))  # OIDHW -> DHWIO
        if cand.shape == tuple(dst_shape):
            return cand
    return None


_SKIP_TOKENS = ("num_batches_tracked",)


def convert_by_order(src_state: tp.Mapping[str, np.ndarray], module,
                     source: str = "torch", strict: bool = True,
                     verbose: bool = False):
    """Write source weights into ``module`` by definition order.

    Works when the architectures are topologically identical (the case for
    every model in this zoo vs its torch/paddle original).  Mismatches
    raise (strict) or are reported.
    """
    from ..core.module import iter_variables

    src_items = [(k, np.asarray(v)) for k, v in src_state.items()
                 if not any(t in k for t in _SKIP_TOKENS)]
    dst_items = list(iter_variables(module))
    unmatched = []
    si = 0
    for path, var in dst_items:
        shape = tuple(np.asarray(var.value).shape)
        found = None
        # search a small window ahead for a shape-compatible source entry
        for j in range(si, min(si + 8, len(src_items))):
            cand = convert_array(src_items[j][1], shape, source)
            if cand is not None:
                found = (j, cand)
                break
        if found is None:
            unmatched.append((path, shape))
            if strict:
                near = [(k, v.shape) for k, v in src_items[si:si + 4]]
                raise ValueError(
                    f"convert_by_order: no source match for {path} {shape}; "
                    f"next source entries: {near}")
            continue
        j, arr = found
        if verbose and j != si:
            print(f"  skipped {j - si} source entries before {path}")
        import jax.numpy as jnp

        var.value = jnp.asarray(arr, np.asarray(var.value).dtype)
        del src_items[j]
    return unmatched


def parity_report(model, ref_fn, inputs, atol=1e-4,
                  convert=lambda x: x) -> dict:
    """Run model vs a reference callable on the same input and report the
    max abs diff (the README '前后误差' methodology)."""
    import jax.numpy as jnp

    from ..core.module import pure, split

    params, state = split(model)
    out, _ = pure(model)(params, state, jnp.asarray(inputs))
    ref = np.asarray(ref_fn(inputs))
    got = convert(np.asarray(out))
    diff = float(np.max(np.abs(got - ref)))
    return {"max_abs_diff": diff, "pass": diff <= atol}
