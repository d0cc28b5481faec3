"""Post-training int8 quantization (ops/quant.py): weight-only and
full-int8 serving paths."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tlxcv_tpu.core import pure, split
from tlxcv_tpu.models import resnet18
from tlxcv_tpu.ops.quant import (calibrate_activations, dequantize_check,
                                 quantize_weights)


def _cos(a, b):
    return float((a * b).sum() /
                 (jnp.linalg.norm(a) * jnp.linalg.norm(b) + 1e-12))


def test_weight_only_int8_close_and_jittable(rng):
    x = jnp.asarray(rng.normal(size=(4, 64, 64, 3)), jnp.float32)
    m = resnet18(num_classes=10)
    p, s = split(m)
    ref, _ = pure(m)(p, s, x)

    n = quantize_weights(m)
    assert n == 21  # every conv + fc in resnet18
    p8, s8 = split(m)
    assert any(v.dtype == jnp.int8 for v in p8.values())
    out, _ = jax.jit(lambda pp, ss, v: pure(m)(pp, ss, v))(p8, s8, x)
    assert _cos(ref, out) > 0.999
    assert (ref.argmax(-1) == out.argmax(-1)).all()
    assert dequantize_check(m)


def test_full_int8_after_calibration(rng):
    x = jnp.asarray(rng.normal(size=(4, 64, 64, 3)), jnp.float32)
    m = resnet18(num_classes=10)
    p, s = split(m)
    ref, _ = pure(m)(p, s, x)

    quantize_weights(m)
    n = calibrate_activations(m, [np.asarray(x[:2])])
    assert n == 21
    p8, s8 = split(m)
    # a_scale params exist and flow through split()
    assert any(k.endswith("a_scale") for k in p8)
    out, _ = jax.jit(lambda pp, ss, v: pure(m)(pp, ss, v))(p8, s8, x)
    assert _cos(ref, out) > 0.995


def test_int8_linear_matches_float(rng):
    import tlxcv_tpu.nn as nn
    from tlxcv_tpu.core.module import Param

    lin = nn.Linear(32, 16)
    x = jnp.asarray(rng.normal(size=(8, 32)), jnp.float32)
    ref = lin(x)
    w = np.asarray(lin.weight.value, np.float32)
    s = np.abs(w).max(axis=0) / 127.0
    lin.weight.value = jnp.asarray(
        np.clip(np.round(w / s), -127, 127).astype(np.int8))
    lin.w_scale = Param(jnp.asarray(s, jnp.float32))
    out = lin(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=0.05,
                               rtol=0.05)


def test_int8_attention_matches_float(rng):
    """Dynamic-int8 sdpa (per-head q/k/v scales, per-row prob scales)
    stays tight against the f32 two-einsum chain, incl. a causal mask."""
    from tlxcv_tpu.nn.attention import scaled_dot_product_attention as sdpa

    q, k, v = (jnp.asarray(rng.normal(size=(2, 4, 128, 32)), jnp.float32)
               for _ in range(3))
    mask = jnp.where(jnp.triu(jnp.ones((128, 128)), 1) > 0, -jnp.inf, 0.0)
    ref = sdpa(q, k, v, mask=mask)
    out = jax.jit(lambda *a: sdpa(*a, use_int8=True))(q, k, v, mask)
    assert _cos(ref, out) > 0.999
    assert float(jnp.abs(ref - out).max()) < 0.05


def test_int8_vit_serving(rng):
    """Full int8 ViT: weight-only Linears + dynamic-int8 attention
    einsums (VERDICT r2 weak #6 — the attention matmuls were the one
    part of a transformer the int8 path left in bf16/f32)."""
    from tlxcv_tpu.models.classification.vision_transformer import \
        VisionTransformer
    from tlxcv_tpu.nn.attention import use_int8_attention

    m = VisionTransformer(img_size=64, patch_size=8, num_classes=10,
                          embed_dim=64, depth=2, num_heads=4, qkv_bias=True)
    x = jnp.asarray(rng.normal(size=(4, 64, 64, 3)), jnp.float32)
    p, s = split(m)
    ref, _ = pure(m)(p, s, x)

    n = quantize_weights(m)
    assert n > 8  # qkv/proj/mlp per block + patch conv + head
    p8, s8 = split(m)
    use_int8_attention(True)
    try:
        out, _ = jax.jit(lambda pp, ss, v: pure(m)(pp, ss, v))(p8, s8, x)
    finally:
        use_int8_attention(False)
    assert _cos(ref, out) > 0.99
    assert (ref.argmax(-1) == out.argmax(-1)).all()


def test_int8_ssd_serving(rng):
    """Full-int8 SSD: head outputs stay tight vs float and the jitted
    predict path (decode + NMS) returns the same detections."""
    from tlxcv_tpu.models.detection import SSD

    x = jnp.asarray(rng.normal(size=(2, 128, 128, 3)), jnp.float32)
    m = SSD(num_classes=4, image_size=(128, 128))
    p, s = split(m)
    ref_dets, _ = jax.jit(lambda pp, ss, v: pure(m)(pp, ss, v,
                                                    training=False))(p, s, x)

    n = quantize_weights(m)
    assert n > 20
    calibrate_activations(
        m, [np.asarray(x[:1])],
        forward=lambda v: m.ssd_head(m.backbone(v)))
    p8, s8 = split(m)
    assert any(k.endswith("a_scale") for k in p8)
    out_dets, _ = jax.jit(lambda pp, ss, v: pure(m)(pp, ss, v,
                                                    training=False))(p8, s8, x)

    ref_rows, ref_counts = ref_dets
    q_rows, q_counts = out_dets
    assert (np.asarray(ref_counts) == np.asarray(q_counts)).all()
    # same kept slots -> same labels, near-identical geometry
    valid = (np.arange(ref_rows.shape[1])[None, :]
             < np.asarray(ref_counts)[:, None])
    if valid.any():
        assert (np.asarray(ref_rows)[valid][:, 0]
                == np.asarray(q_rows)[valid][:, 0]).all()
        db = np.abs(np.asarray(ref_rows) - np.asarray(q_rows))[valid][:, 2:]
        assert db.max() < 4.0  # pixels at 128^2


def test_int8_ppyoloe_serving(rng):
    from tlxcv_tpu.models.detection import ppyoloe

    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
    m = ppyoloe("ppyoloe_s", num_classes=4)
    p, s = split(m)
    ref, _ = jax.jit(lambda pp, ss, v: pure(m)(pp, ss, v,
                                               training=False))(p, s, x)

    n = quantize_weights(m)
    assert n > 40
    calibrate_activations(
        m, [np.asarray(x[:1])],
        forward=lambda v: m.yolo_head(m.neck(m.backbone(v))))
    p8, s8 = split(m)
    out, _ = jax.jit(lambda pp, ss, v: pure(m)(pp, ss, v,
                                               training=False))(p8, s8, x)
    ref_counts = np.asarray(jax.tree_util.tree_leaves(ref)[-1])
    q_counts = np.asarray(jax.tree_util.tree_leaves(out)[-1])
    # random-input detections: counts must agree (no systematic drift)
    assert np.abs(ref_counts.astype(int) - q_counts.astype(int)).max() <= 1


def test_fold_batchnorm_float_exact(rng):
    """BN folding on a FLOAT model is a numerical identity (eval mode)."""
    from tlxcv_tpu.ops.quant import fold_batchnorm

    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
    m = resnet18(num_classes=10)
    # non-trivial running stats (fresh BN stats are mean 0 / var 1)
    for _, mod in m.modules():
        if type(mod).__name__ == "BatchNorm":
            c = mod.running_mean.value.shape[0]
            mod.running_mean.value = jnp.asarray(
                rng.normal(scale=0.2, size=(c,)), jnp.float32)
            mod.running_var.value = jnp.asarray(
                rng.uniform(0.5, 2.0, size=(c,)), jnp.float32)
    p, s = split(m)
    ref, _ = pure(m)(p, s, x)

    n = fold_batchnorm(m, np.asarray(x))
    assert n == 20  # every BN in resnet18 sits behind a conv
    p2, s2 = split(m)
    out, _ = jax.jit(lambda pp, ss, v: pure(m)(pp, ss, v))(p2, s2, x)
    assert float(jnp.max(jnp.abs(out - ref))) < 1e-3 * float(
        jnp.max(jnp.abs(ref)))
    # folded BNs refuse training
    with pytest.raises(RuntimeError):
        pure(m, lambda mm, v: mm(v))(p2, s2, x, training=True)


def test_quantize_for_serving_fused_graph(rng):
    """Full pipeline: fold -> int8 -> calibrate -> producer-side
    requantize.  The fused graph matches the unfused int8 graph, fuses
    exactly the linear conv->conv edges (not residual-feeding convs),
    and carries int8 between fused layers."""
    from tlxcv_tpu.ops.quant import (calibrate_activations, fold_batchnorm,
                                     fuse_requantize, quantize_for_serving)

    x = jnp.asarray(rng.normal(size=(4, 64, 64, 3)), jnp.float32)
    m = resnet18(num_classes=10)
    p, s = split(m)
    ref, _ = pure(m)(p, s, x)

    # unfused int8 baseline on an identical twin (same init -> same nets)
    m2 = resnet18(num_classes=10)
    m2.load_state_dict({**p, **s})
    quantize_weights(m2)
    calibrate_activations(m2, [np.asarray(x[:2])])
    p8, s8 = split(m2)
    base, _ = pure(m2)(p8, s8, x)

    n_fold, n_q, n_cal, n_fuse = quantize_for_serving(
        m, [np.asarray(x[:2])])
    assert (n_fold, n_q, n_cal) == (20, 21, 21)
    # resnet18 BasicBlock: conv1->conv2 fuses in all 8 blocks.  conv2
    # feeds the residual add (untraced) so it never fuses; downsample
    # convs never fuse; the STEM does not fuse either — its maxpool
    # output ALSO feeds layer1.0's residual add, which the trace cannot
    # see but the numerical rollback catches (the whole reason fusion
    # is verified, not structural).
    assert n_fuse == 8
    fused = [path for path, mod in m.modules()
             if getattr(mod, "out_scale", None) is not None]
    assert len(fused) == 8
    assert all(f.endswith("conv1") and "layer" in f for f in fused)

    pf, sf = split(m)
    assert any(k.endswith("out_scale") for k in pf)
    out, _ = jax.jit(lambda pp, ss, v: pure(m)(pp, ss, v))(pf, sf, x)
    assert _cos(base, out) > 0.999
    assert _cos(ref, out) > 0.995


def test_fold_batchnorm_rolls_back_on_verification_failure(rng):
    """A failed equivalence check must leave the model EXACTLY as it was
    (r4 review finding: it used to raise mid-mutation, leaving rescaled
    conv weights + folded BNs with no way back)."""
    from tlxcv_tpu.ops.quant import fold_batchnorm

    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32)
    m = resnet18(num_classes=10)
    for _, mod in m.modules():
        if type(mod).__name__ == "BatchNorm":
            c = mod.running_mean.value.shape[0]
            mod.running_mean.value = jnp.asarray(
                rng.normal(scale=0.2, size=(c,)), jnp.float32)
    p, s = split(m)
    ref, _ = pure(m)(p, s, x)
    before = {k: np.asarray(v) for k, v in {**p, **s}.items()}

    with pytest.raises(ValueError, match="model restored"):
        fold_batchnorm(m, np.asarray(x), tol=-1.0)  # force failure

    p2, s2 = split(m)
    after = {**p2, **s2}
    assert set(after) == set(before)  # no conv.bias params appeared
    for k in before:
        np.testing.assert_array_equal(before[k], np.asarray(after[k]), k)
    # BNs are foldable again and the model still runs
    out, _ = pure(m)(p2, s2, x)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    assert fold_batchnorm(m, np.asarray(x)) == 20
