"""Packed-window Swin attention (set_window_pack) is a pure layout
change: logits must match the unpacked model to fp32 rounding, through
both the shifted-mask path (stage with nW>1) and the pack-across-images
path (last stage, nW=1)."""
import jax
import jax.numpy as jnp
import numpy as np

from tlxcv_tpu.core.module import pure, split
from tlxcv_tpu.models.classification.swin_transformer import (
    SwinTransformer, set_window_pack)


def _micro():
    # 56px/patch4 -> hw 14 (nW=4, shifted blocks carry a real mask)
    # then merge -> hw 7 (nW=1: packing pairs windows across images)
    return SwinTransformer(img_size=56, patch_size=4, num_classes=7,
                           embed_dim=24, depths=(2, 2), num_heads=(2, 4),
                           drop_path_rate=0.0)


def test_window_pack_matches_unpacked():
    m = _micro()
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(4, 56, 56, 3)).astype(np.float32))
    y1 = np.asarray(m(x))
    for p in (2, 4):
        set_window_pack(m, p)
        yp = np.asarray(m(x))
        np.testing.assert_allclose(yp, y1, atol=2e-5, rtol=1e-4)


def test_window_pack_under_jit():
    m = _micro()
    set_window_pack(m, 2)
    params, state = split(m)
    fn = pure(m)
    step = jax.jit(lambda p, s, xx: fn(p, s, xx, training=False)[0])
    x = jnp.asarray(np.random.default_rng(1).normal(
        size=(2, 56, 56, 3)).astype(np.float32))
    set_window_pack(m, 1)
    ref = np.asarray(m(x))
    np.testing.assert_allclose(np.asarray(step(params, state, x)), ref,
                               atol=2e-5, rtol=1e-4)


def test_window_pack_incompatible_falls_back():
    # batch*nW not divisible by pack: block must silently run unpacked
    m = _micro()
    set_window_pack(m, 8)  # stage2: 3 images x 1 window = 3 groups
    x = jnp.asarray(np.random.default_rng(2).normal(
        size=(3, 56, 56, 3)).astype(np.float32))
    set_window_pack(m, 1)
    ref = np.asarray(m(x))
    set_window_pack(m, 8)
    np.testing.assert_allclose(np.asarray(m(x)), ref, atol=2e-5, rtol=1e-4)


def test_window_pack_direct_attn_call_with_raw_mask():
    # direct WindowAttention use (profilers) passes the UNPACKED shift
    # mask; the module must pack it in-graph
    import jax.numpy as jnp

    m = _micro()
    set_window_pack(m, 2)
    blk = m.stages[0][1]  # shifted block at hw=14 (nW=4, real mask)
    assert blk.attn_mask is not None
    x = jnp.asarray(np.random.default_rng(3).normal(
        size=(2 * 4, 49, 24)).astype(np.float32))
    ref = np.asarray(blk.attn(x, jnp.asarray(blk.attn_mask), pack=1))
    got = np.asarray(blk.attn(x, jnp.asarray(blk.attn_mask)))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)
