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
           "convert_by_order", "parity_report", "chw_flatten_to_hwc"]


def chw_flatten_to_hwc(src_weight: np.ndarray, c: int, h: int,
                       w: int) -> np.ndarray:
    """Reorder a source Linear kernel that consumed a **CHW-flattened**
    tensor (torch/paddle ``x.flatten(1)`` after NCHW pooling — AlexNet/
    VGG classifier fc1) onto this framework's **HWC flatten** (NHWC
    ``reshape(b, -1)``).

    A plain transpose maps (out, in) -> (in, out) but leaves the input
    features in C-major order; the converted layer would silently
    permute its inputs.  This helper fixes the one layer that sits on a
    flatten boundary::

        sd = load_torch_weights("alexnet.pth")
        sd["classifier.1.weight"] = chw_flatten_to_hwc(
            sd["classifier.1.weight"], 256, 6, 6)
        convert_by_order(sd, model, source="torch")

    src_weight: (out, c*h*w) torch layout.  Returns (out, h*w*c) — still
    torch layout, so convert_by_order applies its usual transpose.
    """
    src_weight = np.asarray(src_weight)
    out_dim = src_weight.shape[0]
    assert src_weight.shape[1] == c * h * w, (src_weight.shape, c, h, w)
    wgt = src_weight.reshape(out_dim, c, h, w).transpose(0, 2, 3, 1)
    return wgt.reshape(out_dim, h * w * c)


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
                  source: str = "torch",
                  linear_weight: bool = False,
                  convtranspose_weight: bool = False) -> tp.Optional[np.ndarray]:
    """Map a source array onto dst_shape, applying layout transposes.

    ``linear_weight=True`` marks the destination as an nn.Linear kernel:
    torch stores those (out, in) and MUST be transposed even when the
    matrix is square (shape equality alone cannot tell — a square torch
    linear converted untransposed is silently wrong).

    ``convtranspose_weight=True`` marks an nn.ConvTranspose2d kernel:
    torch/paddle store those (in, out, kh, kw), so the IOHW->HWIO
    transpose (2, 3, 0, 1) MUST be used even when in == out — the
    regular-conv OIHW transpose passes the shape check on square
    transposed convs but swaps the in/out axes silently.

    Returns None if no valid mapping exists.
    """
    src = np.asarray(src)
    if (linear_weight and source == "torch" and src.ndim == 2
            and src.T.shape == tuple(dst_shape)):
        return src.T
    if convtranspose_weight and src.ndim == 4 and len(dst_shape) == 4:
        cand = np.transpose(src, (2, 3, 0, 1))  # IOHW -> HWIO
        if cand.shape == tuple(dst_shape):
            return cand
        # do NOT fall through to the regular-conv OIHW transpose: on a
        # grouped transposed conv it can shape-match with the in/out
        # axes crossed across groups (silently wrong weights)
        return None
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

# Parameter "kind" classification: order-based matching is constrained so
# a source entry can only land on a destination slot of the same kind —
# same-shape adjacent params (BN weight/bias/mean/var are all [C]) can no
# longer silently mis-map (VERDICT r1 weak #7).
_KIND_TOKENS = {
    "running_mean": "mean", "_mean": "mean",
    "running_var": "var", "_variance": "var", "running_variance": "var",
    "bias": "bias", "beta": "bias", "b": "bias", "biases": "bias",
    "weight": "weight", "gamma": "weight", "w": "weight", "kernel": "weight",
    "weights": "weight", "filters": "weight", "scale": "weight",
}


def _param_kind(name: str) -> tp.Optional[str]:
    """Classify a parameter name by its last path token; None = unknown
    (matches anything)."""
    last = name.replace(".", "/").rsplit("/", 1)[-1]
    for token in ("running_mean", "_mean", "running_variance", "running_var",
                  "_variance"):
        if name.endswith(token) or last == token.lstrip("_"):
            return _KIND_TOKENS[token]
    return _KIND_TOKENS.get(last)


def _kinds_compatible(src_kind, dst_kind) -> bool:
    if src_kind is None or dst_kind is None:
        return True
    return src_kind == dst_kind


def _kernel_kind_paths(module) -> tuple:
    """(linear_paths, convtranspose_paths): kernel params whose source
    layout cannot be inferred from shape alone — torch Linear (out, in)
    and torch/paddle ConvTranspose2d (in, out, kh, kw) both need forced
    transposes even when square."""
    from .. import nn
    from ..core.module import Module

    linear_types = [nn.Linear]
    try:  # equalized-lr linear (StyleGAN bricks) stores torch (out, in) too
        from ..models.gan.layers import EqualLinear
        linear_types.append(EqualLinear)
    except Exception:  # pragma: no cover
        pass
    linear_types = tuple(linear_types)

    lin, ct = set(), set()

    def walk(obj, prefix):
        if isinstance(obj, Module):
            is_linear = isinstance(obj, linear_types)
            is_ct = isinstance(obj, nn.ConvTranspose2d)
            for name, child in vars(obj).items():
                p = f"{prefix}/{name}" if prefix else name
                if name == "weight":
                    if is_linear:
                        lin.add(p)
                    elif is_ct:
                        ct.add(p)
                walk(child, p)
        elif isinstance(obj, (list, tuple)):
            for i, c in enumerate(obj):
                walk(c, f"{prefix}/{i}" if prefix else str(i))
        elif isinstance(obj, dict):
            for k, c in obj.items():
                walk(c, f"{prefix}/{k}" if prefix else str(k))

    walk(module, "")
    return lin, ct




def _normalize_name(name: str) -> str:
    """Canonical form for cross-framework name comparison: dots ->
    slashes, BN buffer aliases unified, container-wrapper segments
    ('layers') dropped (our Sequential nests under 'layers'; torch/paddle
    Sequential children are bare indices)."""
    n = name.replace(".", "/")
    for old, new in (("/_mean", "/running_mean"),
                     ("/_variance", "/running_var"),
                     ("/running_variance", "/running_var")):
        if n.endswith(old):
            n = n[: -len(old)] + new
    parts = [p for p in n.split("/") if p != "layers"]
    return "/".join(parts)


def convert_by_order(src_state: tp.Mapping[str, np.ndarray], module,
                     source: str = "torch", strict: bool = True,
                     verbose: bool = False, lookahead: int = 8,
                     report: tp.Optional[dict] = None):
    """Write source weights into ``module``.

    Two passes:

    1. **Name pass** — exact normalized-name matches (dots vs slashes, BN
       buffer aliases, container-wrapper segments).  This is immune to
       ordering differences such as torch's state_dict emitting a
       module's direct Parameters before its submodules.
    2. **Order pass** — remaining slots matched in definition order with
       shape- AND kind-aware candidates (a BN bias can never land on a
       BN running-mean slot even though shapes agree).

    Works when the architectures are topologically identical (the case for
    every model in this zoo vs its torch/paddle original).  Mismatches
    raise (strict) or are returned; pass ``report={}`` to also receive the
    full match map, skipped source entries, and leftovers.
    """
    import jax.numpy as jnp

    from ..core.module import iter_variables

    src_items = [(k, np.asarray(v)) for k, v in src_state.items()
                 if not any(t in k for t in _SKIP_TOKENS)]
    dst_all = list(iter_variables(module))
    lw_paths, ct_paths = _kernel_kind_paths(module)
    unmatched = []
    matches = []

    # ---- pass 1: normalized-name matching
    src_by_name = {}
    for idx, (k, v) in enumerate(src_items):
        src_by_name.setdefault(_normalize_name(k), []).append(idx)
    used_src = set()
    named_dst = set()
    for di, (path, var) in enumerate(dst_all):
        cand_idxs = src_by_name.get(_normalize_name(path), ())
        for j in cand_idxs:
            if j in used_src:
                continue
            arr = convert_array(src_items[j][1],
                                tuple(np.asarray(var.value).shape), source,
                                linear_weight=path in lw_paths,
                                convtranspose_weight=path in ct_paths)
            if arr is not None:
                var.value = jnp.asarray(arr, np.asarray(var.value).dtype)
                used_src.add(j)
                named_dst.add(di)
                matches.append((src_items[j][0], path))
                break

    # ---- pass 2: order-based for the rest
    dst_items = [(path, var) for di, (path, var) in enumerate(dst_all)
                 if di not in named_dst]
    src_items = [it for j, it in enumerate(src_items) if j not in used_src]
    # The window always starts at the stream head and skipped entries
    # REMAIN in it: torch emits a module's direct parameters before its
    # submodules, so the dst traversal legitimately needs entries that
    # were passed over earlier (e.g. LeViT's attention_biases).  The
    # cost is a known limitation: an EXTRA source entry (absent from the
    # model) whose shape+kind matches a later dst slot can mis-map it —
    # the name pass, kind constraint, strict mode and the parity-test
    # battery are the guards.
    for path, var in dst_items:
        shape = tuple(np.asarray(var.value).shape)
        dst_kind = _param_kind(path)
        found = None
        # search a small window ahead for a shape+kind-compatible entry
        for j in range(0, min(lookahead, len(src_items))):
            if not _kinds_compatible(_param_kind(src_items[j][0]), dst_kind):
                continue
            cand = convert_array(src_items[j][1], shape, source,
                                 linear_weight=path in lw_paths,
                                 convtranspose_weight=path in ct_paths)
            if cand is not None:
                found = (j, cand)
                break
        if found is None:
            unmatched.append((path, shape))
            if strict:
                near = [(k, v.shape) for k, v in src_items[:4]]
                raise ValueError(
                    f"convert_by_order: no source match for {path} {shape} "
                    f"(kind={dst_kind}); next source entries: {near}")
            continue
        j, arr = found
        if verbose and j:
            print(f"  skipped {j} source entries before {path}")
        matches.append((src_items[j][0], path))
        var.value = jnp.asarray(arr, np.asarray(var.value).dtype)
        del src_items[j]
    if report is not None:
        report["matches"] = matches
        report["unmatched_dst"] = unmatched
        report["leftover_src"] = [(k, v.shape) for k, v in src_items]
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
