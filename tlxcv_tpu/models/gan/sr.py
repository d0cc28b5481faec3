"""Single-image super-resolution (reference tlxcv/models/gan/models/
sr_model.py + its generators): EDSR-style residual generator with
pixel-shuffle upsampling, NHWC."""
from __future__ import annotations

import jax.numpy as jnp

from ... import nn
from ...core.module import Module
from .registry import GENERATORS, MODELS

__all__ = ["EDSRGenerator", "SRModel", "pixel_shuffle"]


def pixel_shuffle(x, factor):
    """NHWC depth-to-space: [N, H, W, C*r^2] -> [N, H*r, W*r, C]."""
    n, h, w, c = x.shape
    r = factor
    x = x.reshape(n, h, w, r, r, c // (r * r))
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h * r, w * r, c // (r * r))


class ResBlock(Module):
    def __init__(self, ch, res_scale=1.0):
        self.conv1 = nn.Conv2d(ch, ch, 3, padding=1)
        self.conv2 = nn.Conv2d(ch, ch, 3, padding=1)
        self.res_scale = res_scale

    def __call__(self, x):
        return x + self.res_scale * self.conv2(nn.relu(self.conv1(x)))


@GENERATORS.register
class EDSRGenerator(Module):
    def __init__(self, scale=2, n_resblocks=8, n_feats=64, res_scale=1.0):
        self.head = nn.Conv2d(3, n_feats, 3, padding=1)
        self.body = [ResBlock(n_feats, res_scale) for _ in range(n_resblocks)]
        self.body_tail = nn.Conv2d(n_feats, n_feats, 3, padding=1)
        ups = []
        s = scale
        while s > 1:
            f = 3 if s % 3 == 0 else 2
            ups.append(nn.Conv2d(n_feats, n_feats * f * f, 3, padding=1))
            ups.append(f)
            s //= f
        self.ups = ups
        self.tail = nn.Conv2d(n_feats, 3, 3, padding=1)

    def __call__(self, x):
        x = self.head(x)
        y = x
        for blk in self.body:
            y = blk(y)
        x = x + self.body_tail(y)
        i = 0
        while i < len(self.ups):
            x = pixel_shuffle(self.ups[i](x), self.ups[i + 1])
            i += 2
        return self.tail(x)


@MODELS.register
class SRModel(Module):
    """(reference sr_model.py) L1 pixel objective."""

    def __init__(self, generator=None):
        self.generator = EDSRGenerator(**(generator or {}))

    def __call__(self, lr):
        return self.generator(lr)

    def loss_fn(self, output, target):
        return jnp.mean(jnp.abs(output - target))
