"""Fréchet Inception Distance for GAN validation.

The reference GAN configs declare an FID validation metric
(reference tlxcv/models/gan/configs/*.yaml `validate.metrics.fid`) but
ship no runner; this is the TPU-native implementation: jitted feature
extraction batched on device, Fréchet distance on host (one small
scipy sqrtm — not in the hot path).

The feature network defaults to this zoo's InceptionV3 pool features
(2048-d).  Load converted pretrained weights into it for
reference-comparable absolute numbers; with any fixed weights the
metric is already a valid relative distance (FID(x, x) = 0, grows with
distribution shift — tested).
"""
from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["FID", "frechet_distance"]


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """||mu1 - mu2||^2 + Tr(s1 + s2 - 2 sqrt(s1 s2))."""
    from scipy import linalg

    mu1, mu2 = np.asarray(mu1), np.asarray(mu2)
    sigma1, sigma2 = np.asarray(sigma1), np.asarray(sigma2)
    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(sigma1 @ sigma2, disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset) @ (sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2)
                 - 2 * np.trace(covmean))


class FID:
    """update(real)/update_fake(fake) streaming moments -> result().

    Images NHWC in [-1, 1] (GAN convention) or [0, 1]; resized on device
    to the feature net's input size.
    """

    def __init__(self, feature_model=None, input_size: int = 299,
                 batch_size: int = 32):
        if feature_model is None:
            from ..models.classification.inceptionv3 import InceptionV3

            feature_model = InceptionV3(num_classes=0 or 1000)
        self.input_size = input_size
        from ..core.module import pure, split

        params, state = split(feature_model)

        def feats(m, x):
            x = m.stem(x)
            for b in m.blocks:
                x = b(x)
            return m.pool(x)  # [B, 2048]

        fwd = pure(feature_model, feats)

        @jax.jit
        def extract(x):
            n, h, w, c = x.shape
            if (h, w) != (input_size, input_size):
                x = jax.image.resize(
                    x, (n, input_size, input_size, c), "bilinear")
            out, _ = fwd(params, state, x)
            return out

        self._extract = extract
        self.batch_size = batch_size
        self.reset()

    # -- streaming moment accumulators ---------------------------------
    def _acc(self, store, images):
        images = np.asarray(images, np.float32)
        for i in range(0, len(images), self.batch_size):
            f = np.asarray(self._extract(
                jnp.asarray(images[i:i + self.batch_size])), np.float64)
            store["n"] += f.shape[0]
            store["s"] += f.sum(0)
            store["ss"] += f.T @ f

    def update(self, real_images):
        self._acc(self._real, real_images)

    def update_fake(self, fake_images):
        self._acc(self._fake, fake_images)

    @staticmethod
    def _moments(store):
        n = max(store["n"], 1)
        mu = store["s"] / n
        cov = store["ss"] / max(n - 1, 1) - np.outer(mu, mu) * n / max(n - 1, 1)
        return mu, cov

    def result(self) -> float:
        mu_r, cov_r = self._moments(self._real)
        mu_f, cov_f = self._moments(self._fake)
        return frechet_distance(mu_r, cov_r, mu_f, cov_f)

    def reset(self):
        d = 2048
        self._real = {"n": 0, "s": np.zeros(d), "ss": np.zeros((d, d))}
        self._fake = {"n": 0, "s": np.zeros(d), "ss": np.zeros((d, d))}
