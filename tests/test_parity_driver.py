"""Synthetic-fixture test for the turnkey pretrained-parity driver
(demo/parity_from_pdparams.py — VERDICT r3 next #9).

No real .pdparams exists on this box, so the fixture WRITES one: a twin
state dict in paddle layouts (conv OIHW, linear (in, out), BN
``_mean``/``_variance`` names) pickled exactly the way
utils.convert.load_pdparams reads it.  The driver must load it with
full coverage, reproduce the donor model's output bit-for-bit
(max_abs_diff == 0 vs the donor's recorded output), and fail loudly
when the expected output disagrees.
"""
import os
import pickle

import numpy as np
import pytest

from demo.parity_from_pdparams import check_one
from tlxcv_tpu.core import pure, split
from tlxcv_tpu.core.init import set_seed


def _make_fixture(tmp_path, name="resnet18", num_classes=13):
    """Build a donor model, export its weights as a .pdparams file in
    paddle layouts, and record its output on the driver's seeded input."""
    import jax.numpy as jnp

    from tlxcv_tpu.config import _MODEL_REGISTRY, _populate
    from tlxcv_tpu.core.module import iter_variables

    _populate()
    set_seed(0)  # the driver uses the same seed before building
    donor = _MODEL_REGISTRY[name](num_classes=num_classes)

    sd = {}
    for path, var in iter_variables(donor):
        arr = np.asarray(var.value)
        key = path.replace("/", ".")
        if arr.ndim == 4:                      # HWIO -> paddle OIHW
            arr = arr.transpose(3, 2, 0, 1)
        # paddle Linear kernels are (in, out) — same as ours, no-op
        if key.endswith("running_mean"):
            key = key[:-len("running_mean")] + "_mean"
        elif key.endswith("running_var"):
            key = key[:-len("running_var")] + "_variance"
        sd[key] = arr

    x = np.random.default_rng(0).normal(size=(1, 64, 64, 3)).astype(
        np.float32)
    params, state = split(donor)
    out, _ = pure(donor)(params, state, jnp.asarray(x), training=False)
    out = np.asarray(out, np.float32)

    wdir = tmp_path / "weights"
    wdir.mkdir()
    with open(wdir / f"{name}.pdparams", "wb") as f:
        pickle.dump(sd, f, protocol=2)
    edir = tmp_path / "expected"
    edir.mkdir()
    np.savez(edir / f"{name}.npz", input=x, output=out)
    return str(wdir), str(edir), out


def test_roundtrip_exact_parity(tmp_path):
    wdir, edir, _ = _make_fixture(tmp_path)
    row = check_one("resnet18", os.path.join(wdir, "resnet18.pdparams"),
                    num_classes=13, size=64, expected_dir=edir)
    assert "error" not in row, row
    assert row["unmatched_dst"] == 0, row
    assert row["leftover_src"] == 0, row
    assert row["max_abs_diff"] == 0.0, row
    assert row["pass"] is True
    assert os.path.exists(row["fingerprint_file"])


def test_fingerprint_only_mode(tmp_path):
    wdir, edir, out = _make_fixture(tmp_path)
    row = check_one("resnet18", os.path.join(wdir, "resnet18.pdparams"),
                    num_classes=13, size=64, expected_dir=None)
    assert "max_abs_diff" not in row
    with np.load(row["fingerprint_file"]) as z:
        # fingerprint-only mode uses the seeded 64x64 input, which is
        # NOT the expected-dir input; only shape agreement is promised
        assert z["output"].shape == out.shape


def test_wrong_expected_fails(tmp_path):
    wdir, edir, out = _make_fixture(tmp_path)
    # poison the expected output (same input)
    x = np.random.default_rng(0).normal(size=(1, 64, 64, 3)).astype(
        np.float32)
    np.savez(os.path.join(edir, "resnet18.npz"), input=x, output=out + 1.0)
    row = check_one("resnet18", os.path.join(wdir, "resnet18.pdparams"),
                    num_classes=13, size=64, expected_dir=edir)
    assert row["max_abs_diff"] >= 1.0
    assert row["pass"] is False


def test_nchw_expected_input_transposed(tmp_path):
    """Paddle-side npz files will carry NCHW inputs; the driver must
    transpose them before the NHWC forward."""
    wdir, edir, out = _make_fixture(tmp_path)
    with np.load(os.path.join(edir, "resnet18.npz")) as z:
        x, y = z["input"], z["output"]
    np.savez(os.path.join(edir, "resnet18.npz"),
             input=x.transpose(0, 3, 1, 2), output=y)
    row = check_one("resnet18", os.path.join(wdir, "resnet18.pdparams"),
                    num_classes=13, size=64, expected_dir=edir)
    assert row["max_abs_diff"] == 0.0, row
