"""Image-quality validation metrics (PSNR / SSIM) for GAN training.

The reference's GAN configs declare these as validate-loop metrics
(reference tlxcv/models/gan/configs/prenet.yaml `validate.metrics`:
PSNR/SSIM with `crop_border` and `test_y_channel` options) but ship no
runner.  These are the TPU-native implementations: jitted, batched NHWC,
semantics matching the standard BasicSR/PaddleGAN definitions so
numbers are comparable to published ones:

- images are interpreted on the 0..255 scale ([0, 1] inputs are scaled);
- ``test_y_channel`` converts RGB to the BT.601 Y channel
  (65.481 R + 128.553 G + 24.966 B + 16, on [0, 1] inputs);
- ``crop_border`` trims N pixels from every edge before scoring;
- SSIM uses the 11x11 sigma-1.5 gaussian window and C1/C2 from the
  original paper, averaged over channels.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["psnr", "ssim", "to_y_channel"]


def _to_255(img, input_range=None):
    """Map onto the 0..255 scale.

    input_range: None (infer from THIS tensor's min/max), "01", "pm1"
    ([-1, 1] GAN convention) or "255" (pass through).  Callers scoring a
    pred/target pair must derive one range from the *target* and apply
    it to both (see `_prep`) so the two are never scaled inconsistently.
    """
    img = jnp.asarray(img, jnp.float32)
    if input_range == "01":
        return img * 255.0
    if input_range == "pm1":
        return (img + 1.0) * 127.5
    if input_range == "255":
        return img
    lo, hi = img.min(), img.max()
    unit = (hi <= 1.0 + 1e-6) & (lo >= -1.0 - 1e-6)
    scaled = jnp.where(lo < -1e-6, (img + 1.0) * 127.5, img * 255.0)
    return jnp.where(unit, scaled, img)


def to_y_channel(img255):
    """BT.601 luma of an RGB NHWC image on the 0..255 scale."""
    w = jnp.asarray([65.481, 128.553, 24.966], jnp.float32)
    return (img255 / 255.0) @ w + 16.0


def _prep(a, b, crop_border, test_y_channel, input_range=None):
    if input_range is None:
        # Infer ONE mapping from the target and apply it to both, so a
        # [-1,1]-convention pred batch that happens to be all
        # non-negative still gets the same scaling as its target.
        b = jnp.asarray(b, jnp.float32)
        lo, hi = b.min(), b.max()
        unit = (hi <= 1.0 + 1e-6) & (lo >= -1.0 - 1e-6)
        signed = lo < -1e-6

        def scale(x):
            x = jnp.asarray(x, jnp.float32)
            s = jnp.where(signed, (x + 1.0) * 127.5, x * 255.0)
            return jnp.where(unit, s, x)
        a, b = scale(a), scale(b)
    else:
        a, b = _to_255(a, input_range), _to_255(b, input_range)
    if a.ndim == 3:
        a, b = a[None], b[None]
    if test_y_channel and a.shape[-1] == 3:
        a, b = to_y_channel(a)[..., None], to_y_channel(b)[..., None]
    if crop_border:
        a = a[:, crop_border:-crop_border, crop_border:-crop_border]
        b = b[:, crop_border:-crop_border, crop_border:-crop_border]
    return a, b


@partial(jax.jit, static_argnames=("crop_border", "test_y_channel",
                                   "input_range"))
def psnr(pred, target, crop_border: int = 0, test_y_channel: bool = False,
         input_range: str | None = None):
    """Per-image PSNR (dB) on the 0..255 scale; returns [N].

    input_range: "01" / "pm1" / "255" to state the convention
    explicitly; None infers it once from `target` and applies the same
    mapping to both tensors.
    """
    a, b = _prep(pred, target, crop_border, test_y_channel, input_range)
    mse = jnp.mean((a - b) ** 2, axis=(1, 2, 3))
    # Identical images -> inf.  The threshold sits far above XLA's
    # half-ulp rewrite noise (~1e-11 on the 0..255 scale) and far below
    # any real signal (one uint8 LSB in one pixel is mse >= 1/(H*W)).
    return jnp.where(mse <= 1e-8, jnp.inf,
                     20.0 * jnp.log10(255.0 / jnp.sqrt(jnp.maximum(mse, 1e-8))))


def _gaussian_window(size=11, sigma=1.5):
    x = np.arange(size) - size // 2
    g = np.exp(-(x ** 2) / (2 * sigma ** 2))
    g = g / g.sum()
    return jnp.asarray(np.outer(g, g), jnp.float32)


def _filter2(img, win):
    # depthwise valid conv of [N,H,W,C] with the [k,k] window
    k = win.shape[0]
    c = img.shape[-1]
    kern = jnp.broadcast_to(win[:, :, None, None], (k, k, 1, c))
    return jax.lax.conv_general_dilated(
        img, kern, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)


@partial(jax.jit, static_argnames=("crop_border", "test_y_channel",
                                   "input_range"))
def ssim(pred, target, crop_border: int = 0, test_y_channel: bool = False,
         input_range: str | None = None):
    """Per-image mean SSIM (channel-averaged); returns [N]."""
    a, b = _prep(pred, target, crop_border, test_y_channel, input_range)
    win = _gaussian_window()
    c1, c2 = (0.01 * 255) ** 2, (0.03 * 255) ** 2
    mu_a, mu_b = _filter2(a, win), _filter2(b, win)
    mu_aa, mu_bb, mu_ab = mu_a * mu_a, mu_b * mu_b, mu_a * mu_b
    s_aa = _filter2(a * a, win) - mu_aa
    s_bb = _filter2(b * b, win) - mu_bb
    s_ab = _filter2(a * b, win) - mu_ab
    m = ((2 * mu_ab + c1) * (2 * s_ab + c2)
         / ((mu_aa + mu_bb + c1) * (s_aa + s_bb + c2)))
    return jnp.mean(m, axis=(1, 2, 3))
