"""Pallas / MXU fast-path ops vs the reference interpolate."""
import jax
import jax.numpy as jnp
import numpy as np

from tlxcv_tpu.ops.image import interpolate
from tlxcv_tpu.ops.pallas import (upsample2x_bilinear,
                                  upsample2x_fused,
                                  upsample2x_matmul)


def test_pallas_upsample_interpret_exact(rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 16, 8)), jnp.float32)
    ref = interpolate(x, scale_factor=2, mode="bilinear", fast_path=False)
    out = upsample2x_bilinear(x, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_matmul_upsample_exact_f32(rng):
    x = jnp.asarray(rng.normal(size=(2, 13, 9, 4)), jnp.float32)
    ref = interpolate(x, scale_factor=2, mode="bilinear", fast_path=False)
    out = upsample2x_matmul(x, precision="highest")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_fused_upsample_interpret_exact_and_grad(rng):
    """The production Pallas kernel (2D-matmul formulation that compiles
    on the real TPU): forward matches the gather reference; the custom
    VJP matches the einsum path's gradient."""
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 128)), jnp.float32)
    ref = interpolate(x, scale_factor=2, mode="bilinear", fast_path=False)
    out = upsample2x_fused(x, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    g1 = jax.grad(lambda v: (upsample2x_fused(v, interpret=True) ** 2).sum())(x)
    g2 = jax.grad(lambda v: (upsample2x_matmul(v) ** 2).sum())(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4)


def test_interpolate_2x_fast_path_matches_reference(rng):
    """ops.interpolate now routes exact-2x bilinear to the MXU/Pallas
    fast path by default — numerics must stay identical to the gather
    formulation."""
    x = jnp.asarray(rng.normal(size=(2, 10, 14, 32)), jnp.float32)
    fast = interpolate(x, scale_factor=2, mode="bilinear")
    ref = interpolate(x, scale_factor=2, mode="bilinear", fast_path=False)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref), atol=1e-5)


def test_fused_upsample_add_interpret_and_grad(rng):
    """upsample_add_fused (resize + consumer add in one VMEM pass):
    forward matches the gather reference for bilinear AND nearest, 2x
    and 4x; the custom VJP matches autodiff of the reference
    composition.  (Kernel compiles on the real v5e but loses to XLA's
    composition in-graph — see BENCHMARKS.md — so it is opt-in.)"""
    from tlxcv_tpu.ops.pallas.upsample import upsample_add_fused

    x = jnp.asarray(rng.normal(size=(2, 8, 8, 128)), jnp.float32)
    for oh in (16, 32):
        skip = jnp.asarray(rng.normal(size=(2, oh, oh, 128)), jnp.float32)
        for mode in ("bilinear", "nearest"):
            if mode == "nearest":
                ref = interpolate(x, size=(oh, oh), mode="nearest") + skip
            else:
                ref = interpolate(x, size=(oh, oh), mode="bilinear",
                                  fast_path=False) + skip
            out = upsample_add_fused(x, skip, mode=mode, interpret=True)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       atol=1e-5)

    skip = jnp.asarray(rng.normal(size=(2, 16, 16, 128)), jnp.float32)
    g1 = jax.grad(lambda v, s: (upsample_add_fused(
        v, s, interpret=True) ** 2).sum(), argnums=(0, 1))(x, skip)
    g2 = jax.grad(lambda v, s: ((upsample2x_matmul(v) + s) ** 2).sum(),
                  argnums=(0, 1))(x, skip)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_general_upsample_matmul(rng):
    """upsample_matmul: arbitrary-size separable resize as two static
    matmuls (the HRNet FuseLayers 4x/8x shape class)."""
    from tlxcv_tpu.ops.pallas.upsample import upsample_matmul

    x = jnp.asarray(rng.normal(size=(2, 9, 7, 16)), jnp.float32)
    for oh, ow in ((36, 28), (18, 14), (27, 21)):
        ref = interpolate(x, size=(oh, ow), mode="bilinear",
                          fast_path=False)
        out = upsample_matmul(x, oh, ow)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)


def test_upsample_add_routing(rng):
    """ops.image.upsample_add (public FPN/fuse pattern): both routes
    (XLA default, Pallas opt-in) agree with the reference composition."""
    from tlxcv_tpu.ops.image import upsample_add

    x = jnp.asarray(rng.normal(size=(2, 8, 8, 128)), jnp.float32)
    skip = jnp.asarray(rng.normal(size=(2, 16, 16, 128)), jnp.float32)
    for mode in ("bilinear", "nearest"):
        if mode == "nearest":
            ref = interpolate(x, size=(16, 16), mode="nearest") + skip
        else:
            ref = interpolate(x, size=(16, 16), mode="bilinear",
                              fast_path=False) + skip
        np.testing.assert_allclose(
            np.asarray(upsample_add(x, skip, mode=mode)), np.asarray(ref),
            atol=1e-5)


def test_flash_attention_interpret_matches_xla(rng):
    """2D-blocked flash attention (ops/pallas/attention.py): interpret
    mode must match the XLA two-einsum composition bit-tight, across
    padding regimes (S not multiple of block, D < 128, nb packing,
    bias)."""
    from tlxcv_tpu.nn.attention import scaled_dot_product_attention
    from tlxcv_tpu.ops.pallas.attention import flash_attention

    for (bh, s, d, nb) in [(4, 197, 64, 1), (6, 197, 64, 3),
                           (8, 49, 32, 4)]:
        q = jnp.asarray(rng.normal(size=(bh, s, d)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(bh, s, d)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(bh, s, d)), jnp.float32)
        ref = scaled_dot_product_attention(q, k, v)
        out = flash_attention(q, k, v, nb=nb, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5)
        bias = jnp.asarray(rng.normal(size=(bh, s, s)), jnp.float32)
        ref_b = scaled_dot_product_attention(q, k, v, mask=bias)
        out_b = flash_attention(q, k, v, bias=bias, nb=nb, interpret=True)
        np.testing.assert_allclose(np.asarray(out_b), np.asarray(ref_b),
                                   atol=2e-5)


def test_sdpa_use_flash_wiring(rng, monkeypatch):
    """scaled_dot_product_attention(use_flash=True) routes through the
    Pallas kernel and matches the XLA path ([B, H, S, D] + mask)."""
    import tlxcv_tpu.ops.pallas.attention as PA
    from tlxcv_tpu import nn

    orig = PA.flash_attention
    monkeypatch.setattr(PA, "flash_attention",
                        lambda *a, **kw: orig(*a, **{**kw,
                                                     "interpret": True}))
    q = jnp.asarray(rng.normal(size=(2, 3, 60, 32)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(2, 3, 60, 32)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(2, 3, 60, 32)), jnp.float32)
    mask = jnp.asarray(rng.normal(size=(1, 1, 60, 60)), jnp.float32)
    from tlxcv_tpu.nn.attention import scaled_dot_product_attention
    ref = scaled_dot_product_attention(q, k, v, mask=mask)
    out = scaled_dot_product_attention(q, k, v, mask=mask, use_flash=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


def test_flash_attention_fully_masked_rows_no_nan():
    """-inf bias entries must not poison the online softmax (review
    finding: a query tile whose entire first kv-block is masked left
    m = -inf and p = exp(-inf - -inf) = NaN)."""
    import jax.numpy as jnp
    import numpy as np

    from tlxcv_tpu.ops.pallas.attention import flash_attention

    rng = np.random.default_rng(0)
    bh, s, d = 2, 64, 32
    q = jnp.asarray(rng.normal(size=(bh, s, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(bh, s, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(bh, s, d)), jnp.float32)
    # block-diagonal mask: query i attends only within its 32-segment;
    # with block_k=32 the first kv block is FULLY masked for the second
    # segment's queries
    seg = np.arange(s) // 32
    mask = np.where(seg[:, None] == seg[None, :], 0.0, -np.inf)
    bias = jnp.asarray(np.broadcast_to(mask, (1, s, s)), jnp.float32)
    out = flash_attention(q, k, v, bias=bias, block_q=32, block_k=32,
                          interpret=True)
    assert np.isfinite(np.asarray(out)).all()
    # matches the XLA reference under the same mask
    scale = d ** -0.5
    logits = jnp.einsum("bqd,bkd->bqk", q, k) * scale + bias
    ref = jnp.einsum("bqk,bkd->bqd", jax.nn.softmax(logits, -1), v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_flash_attention_rejects_bad_bias_leading_dim():
    import jax.numpy as jnp
    import numpy as np
    import pytest

    from tlxcv_tpu.ops.pallas.attention import flash_attention

    q = jnp.zeros((4, 16, 32), jnp.float32)
    with pytest.raises(ValueError):
        flash_attention(q, q, q, bias=jnp.zeros((2, 16, 16)),
                        interpret=True)
