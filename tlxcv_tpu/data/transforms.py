"""Image transforms.

Two tiers (SURVEY.md §7 step 2):

- **Host transforms** (this module's classes): cheap per-sample numpy ops
  mirroring `tlx.vision.transforms` (Compose/Resize/Normalize/ToTensor),
  applied in the DataLoader.  Output is always NHWC float32.
- **Device transforms** (:func:`batch_preprocess`): the batched hot path
  (resize/normalize/flip) as one jitted NHWC function, meant to be fused
  into the train step so preprocessing rides XLA instead of per-sample
  python (replaces reference escape #11).
"""
from __future__ import annotations

import functools
import typing as tp

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover - cv2 is present in this image
    cv2 = None

import jax
import jax.numpy as jnp


class Compose:
    def __init__(self, transforms):
        self.transforms = list(transforms)

    def __call__(self, x):
        for t in self.transforms:
            x = t(x)
        return x


class Resize:
    def __init__(self, size, interpolation="bilinear"):
        self.size = tuple(size) if isinstance(size, (tuple, list)) else (size, size)
        self.interpolation = interpolation

    def __call__(self, img):
        h, w = self.size
        if cv2 is not None:
            interp = cv2.INTER_LINEAR if self.interpolation == "bilinear" else cv2.INTER_NEAREST
            out = cv2.resize(np.asarray(img), (w, h), interpolation=interp)
            if out.ndim == 2:
                out = out[..., None]
            return out
        # numpy fallback: nearest
        img = np.asarray(img)
        ys = (np.arange(h) * img.shape[0] / h).astype(int)
        xs = (np.arange(w) * img.shape[1] / w).astype(int)
        return img[ys][:, xs]


class Normalize:
    def __init__(self, mean, std):
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)

    def __call__(self, img):
        return (np.asarray(img, np.float32) - self.mean) / self.std


class ToTensor:
    """No-op layout-wise (we are NHWC already); casts to float32."""

    def __init__(self, data_format="HWC"):
        if data_format not in ("HWC", "CHW"):
            raise ValueError(data_format)
        self.data_format = data_format

    def __call__(self, img):
        img = np.asarray(img, np.float32)
        if self.data_format == "CHW":
            img = np.transpose(img, (2, 0, 1))
        return img


class RandomFlipHorizontal:
    def __init__(self, prob=0.5, seed=0):
        self.prob = prob
        self._rng = np.random.default_rng(seed)

    def __call__(self, img):
        if self._rng.random() < self.prob:
            return np.ascontiguousarray(img[:, ::-1])
        return img


class RandomCrop:
    def __init__(self, size, pad=0, seed=0):
        self.size = tuple(size) if isinstance(size, (tuple, list)) else (size, size)
        self.pad = pad
        self._rng = np.random.default_rng(seed)

    def __call__(self, img):
        if self.pad:
            img = np.pad(img, ((self.pad, self.pad), (self.pad, self.pad), (0, 0)),
                         mode="reflect")
        h, w = img.shape[:2]
        th, tw = self.size
        i = int(self._rng.integers(0, h - th + 1))
        j = int(self._rng.integers(0, w - tw + 1))
        return img[i:i + th, j:j + tw]


# --------------------------------------------------------------------------
# Device-side batched preprocessing (jit; compose into the train step)
# --------------------------------------------------------------------------
@functools.partial(jax.jit, static_argnames=("size", "training"))
def batch_preprocess(images, mean, std, key=None, size=None, training=False):
    """uint8/float NHWC batch -> normalized float32, optional resize +
    random horizontal flip.  One fused XLA computation feeding HBM."""
    x = images.astype(jnp.float32)
    if size is not None and tuple(size) != x.shape[1:3]:
        from ..ops.image import interpolate

        x = interpolate(x, size=size, mode="bilinear")
    x = (x - jnp.asarray(mean, jnp.float32)) / jnp.asarray(std, jnp.float32)
    if training and key is not None:
        flip = jax.random.bernoulli(key, 0.5, (x.shape[0], 1, 1, 1))
        x = jnp.where(flip, x[:, :, ::-1, :], x)
    return x


class FusedResizeNormalize:
    """Fused resize + normalize through the native C++ batch path
    (tlxcv_tpu.native) — one multi-threaded pass, ~3x cv2+numpy. Works
    per-sample in a transform pipeline or on whole batches."""

    def __init__(self, size, mean, std, threads=0):
        self.size = tuple(size) if isinstance(size, (tuple, list)) else (size, size)
        self.mean = mean
        self.std = std
        self.threads = threads

    def __call__(self, img):
        from .. import native

        img = np.asarray(img)
        batched = img.ndim == 4
        out = native.resize_normalize_batch(
            img if batched else img[None], self.size, self.mean, self.std,
            self.threads)
        return out if batched else out[0]
