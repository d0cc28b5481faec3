"""Turnkey pretrained-weight parity: .pdparams directory -> README table.

The reference's entire published verification is a per-model forward
diff against the Paddle originals using real pretrained weights
(/root/reference/README.md:30-143, the "前后误差" tables).  No weight
file exists on this box (zero egress), so the run itself is
environment-blocked — this driver makes it turnkey the day weights
appear:

    python demo/parity_from_pdparams.py /path/to/weights \
        [--expected /path/to/expected] [--num-classes 1000] [--size 224]

For every ``<model>.pdparams`` in the weights directory whose stem
matches a registered model factory (tlxcv_tpu.config, 160+ names):

1. build the model, load the weights with the paddle-free unpickler
   (utils.convert.load_pdparams) and ``convert_by_order`` (normalized
   -name pass + kind-aware order pass, Linear/ConvTranspose layout
   rules),
2. report COVERAGE — every destination slot must be written and every
   source entry consumed (unmatched/leftover counts are the first
   thing that catches a topology mismatch),
3. run an eval-mode forward on a fixed seeded input (NHWC; the same
   input is derivable anywhere from the seed) and write
   ``<model>.fingerprint.npz`` (input seed + output) next to the
   weights,
4. if ``--expected`` holds a ``<model>.npz`` with the Paddle original's
   output on the same input (key ``output``, optional ``input`` to
   override the seeded one; NCHW inputs are transposed), print the
   README-style max-abs-diff and pass/fail at ``--atol``.

Without ``--expected`` the fingerprints are the artifact: compute the
same forwards in a Paddle environment, diff offline.

Synthetic-fixture test: tests/test_parity_driver.py round-trips a twin
state dict through a real .pdparams-format file and asserts diff == 0.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
import numpy as np


def _build(name, num_classes):
    from tlxcv_tpu.config import _MODEL_REGISTRY, _populate

    _populate()
    if name not in _MODEL_REGISTRY:
        return None
    factory = _MODEL_REGISTRY[name]
    try:
        return factory(num_classes=num_classes)
    except TypeError:  # factory without a num_classes knob (GANs etc.)
        return factory()


def check_one(name, weights_path, num_classes=1000, size=224, atol=1e-4,
              expected_dir=None, seed=0):
    """Load one .pdparams into the registry model ``name``; return the
    report row (coverage + fingerprint + optional diff-vs-expected)."""
    import jax.numpy as jnp

    from tlxcv_tpu.core import pure, split
    from tlxcv_tpu.core.init import set_seed
    from tlxcv_tpu.utils.convert import convert_by_order, load_pdparams

    set_seed(0)  # model construction draws from the global host RNG
    model = _build(name, num_classes)
    if model is None:
        return {"model": name, "error": "not in the model registry"}
    sd = load_pdparams(weights_path)
    report = {}
    unmatched = convert_by_order(sd, model, source="paddle", strict=False,
                                 report=report)
    row = {"model": name,
           "src_entries": len(sd),
           "matched": len(report["matches"]),
           "unmatched_dst": len(unmatched),
           "leftover_src": len(report["leftover_src"])}
    if unmatched:
        row["unmatched_dst_names"] = [p for p, _ in unmatched[:8]]
    if report["leftover_src"]:
        row["leftover_src_names"] = [k for k, _ in
                                     report["leftover_src"][:8]]

    rng = np.random.default_rng(seed)
    x = rng.normal(size=(1, size, size, 3)).astype(np.float32)
    expected = None
    if expected_dir:
        exp_path = os.path.join(expected_dir, f"{name}.npz")
        if os.path.exists(exp_path):
            with np.load(exp_path) as z:
                expected = np.asarray(z["output"], np.float32)
                if "input" in z:
                    xin = np.asarray(z["input"], np.float32)
                    if xin.ndim == 4 and xin.shape[1] in (1, 3) \
                            and xin.shape[-1] not in (1, 3):
                        xin = xin.transpose(0, 2, 3, 1)  # NCHW -> NHWC
                    x = xin

    params, state = split(model)
    out, _ = pure(model)(params, state, jnp.asarray(x), training=False)
    out = np.asarray(out, np.float32)
    row["output_shape"] = list(out.shape)
    row["fingerprint"] = {"seed": seed, "size": size,
                          "mean": float(out.mean()),
                          "std": float(out.std()),
                          "first5": [float(v) for v in out.ravel()[:5]]}
    fp_path = os.path.join(os.path.dirname(weights_path),
                           f"{name}.fingerprint.npz")
    np.savez(fp_path, input_seed=seed, input_size=size, output=out)
    row["fingerprint_file"] = fp_path

    if expected is not None:
        diff = float(np.max(np.abs(out - expected.reshape(out.shape))))
        row["max_abs_diff"] = diff
        row["pass"] = diff <= atol
    return row


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="README-style pretrained parity from a .pdparams dir")
    ap.add_argument("weights_dir")
    ap.add_argument("--expected", default=None,
                    help="dir of <model>.npz with the Paddle outputs")
    ap.add_argument("--models", default=None,
                    help="comma-separated subset (default: every "
                         "*.pdparams whose stem is a registry name)")
    ap.add_argument("--num-classes", type=int, default=1000)
    ap.add_argument("--size", type=int, default=224)
    ap.add_argument("--atol", type=float, default=1e-4)
    ap.add_argument("--json", dest="json_out", default=None,
                    help="also write the rows to this path")
    args = ap.parse_args(argv)

    stems = sorted(f[:-len(".pdparams")]
                   for f in os.listdir(args.weights_dir)
                   if f.endswith(".pdparams"))
    if args.models:
        want = set(args.models.split(","))
        stems = [s for s in stems if s in want]
    if not stems:
        raise SystemExit(f"no .pdparams files in {args.weights_dir}")

    rows = []
    for name in stems:
        path = os.path.join(args.weights_dir, f"{name}.pdparams")
        print(f"== {name} ==", flush=True)
        try:
            row = check_one(name, path, num_classes=args.num_classes,
                            size=args.size, atol=args.atol,
                            expected_dir=args.expected)
        except Exception as e:  # keep sweeping the table
            row = {"model": name, "error": f"{type(e).__name__}: {e}"}
        rows.append(row)
        if "error" in row:
            print(f"   ERROR {row['error']}")
        else:
            cov = (f"matched {row['matched']}, "
                   f"unmatched_dst {row['unmatched_dst']}, "
                   f"leftover_src {row['leftover_src']}")
            diff = (f"  max_abs_diff {row['max_abs_diff']:.3e} "
                    f"{'PASS' if row['pass'] else 'FAIL'}"
                    if "max_abs_diff" in row else "  (no expected output)")
            print(f"   {cov}{diff}")

    # README-style table
    print("\n| model | coverage | max fwd diff |")
    print("|---|---|---|")
    for r in rows:
        if "error" in r:
            print(f"| {r['model']} | ERROR: {r['error']} | — |")
            continue
        cov = "full" if not r["unmatched_dst"] and not r["leftover_src"] \
            else (f"{r['unmatched_dst']} unfilled / "
                  f"{r['leftover_src']} leftover")
        d = (f"{r['max_abs_diff']:.3e}" if "max_abs_diff" in r
             else "fingerprint only")
        print(f"| {r['model']} | {cov} | {d} |")

    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(rows, f, indent=1)
    # leftover_src fails too: unconsumed source weights are the same
    # topology-mismatch signal as unfilled destinations (e.g. an aux
    # head the rebuild lacks) and must not exit 0
    bad = [r["model"] for r in rows
           if "error" in r or r.get("pass") is False
           or r.get("unmatched_dst") or r.get("leftover_src")]
    if bad:
        raise SystemExit(f"parity problems: {bad}")


if __name__ == "__main__":
    main()
