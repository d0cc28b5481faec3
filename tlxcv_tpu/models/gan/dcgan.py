"""DCGAN (reference tlxcv/models/gan/models/{dc_gan_model.py,
generators/dcgenerator.py, discriminators/dcdiscriminator.py}), NHWC.

Noise comes from the framework RNG context (functional keys), not a
backend global RNG.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ... import nn
from ...core.module import Module, has_rng, rng
from .registry import DISCRIMINATORS, GENERATORS, MODELS

__all__ = ["DCGenerator", "DCDiscriminator", "DCGANModel"]


@GENERATORS.register
class DCGenerator(Module):
    """z [B, 1, 1, nz] -> image [B, 64*2^k, ...], tanh output."""

    def __init__(self, input_nz=100, input_nc=3, output_nc=3, ngf=64):
        self.input_nz = input_nz
        self.net = nn.Sequential(
            nn.ConvTranspose2d(input_nz, ngf * 8, 4, stride=1, bias=False),
            nn.BatchNorm(ngf * 8), nn.Activation("relu"),
            nn.ConvTranspose2d(ngf * 8, ngf * 4, 4, stride=2, padding=1,
                               bias=False),
            nn.BatchNorm(ngf * 4), nn.Activation("relu"),
            nn.ConvTranspose2d(ngf * 4, ngf * 2, 4, stride=2, padding=1,
                               bias=False),
            nn.BatchNorm(ngf * 2), nn.Activation("relu"),
            nn.ConvTranspose2d(ngf * 2, ngf, 4, stride=2, padding=1,
                               bias=False),
            nn.BatchNorm(ngf), nn.Activation("relu"),
            nn.ConvTranspose2d(ngf, output_nc, 4, stride=2, padding=1,
                               bias=False),
            nn.Activation("tanh"),
        )

    def __call__(self, z):
        return self.net(z)


@DISCRIMINATORS.register
class DCDiscriminator(Module):
    def __init__(self, input_nc=3, ndf=64):
        def block(cin, cout, bn=True):
            layers = [nn.Conv2d(cin, cout, 4, stride=2, padding=1, bias=False)]
            if bn:
                layers.append(nn.BatchNorm(cout))
            layers.append(nn.Activation(lambda x: nn.leaky_relu(x, 0.2)))
            return layers

        self.net = nn.Sequential(
            *block(input_nc, ndf, bn=False), *block(ndf, ndf * 2),
            *block(ndf * 2, ndf * 4), *block(ndf * 4, ndf * 8),
            nn.Conv2d(ndf * 8, 1, 4, stride=1, bias=False),
        )

    def __call__(self, x):
        return self.net(x)


@MODELS.register
class DCGANModel(Module):
    """(reference dc_gan_model.py: forward :30-38, losses/backward)."""

    def __init__(self, generator=None, discriminator=None):
        generator = generator or {"input_nz": 100, "input_nc": 3,
                                  "output_nc": 3, "ngf": 64}
        discriminator = discriminator if discriminator is not None else \
            {"input_nc": 3, "ndf": 64}
        self.input_nz = generator["input_nz"]
        self.netG = DCGenerator(**generator)
        self.netD = DCDiscriminator(**discriminator) if discriminator else None

    def sample_noise(self, batch, key=None):
        if key is None:
            key = rng("noise")
        return jax.random.normal(key, (batch, 1, 1, self.input_nz))

    def __call__(self, real):
        z = self.sample_noise(real.shape[0])
        return self.netG(z)

    def gan_loss(self, prediction, target_is_real):
        target = jnp.ones_like(prediction) if target_is_real else \
            jnp.zeros_like(prediction)
        from ...ops.losses import binary_cross_entropy

        return binary_cross_entropy(prediction, target)

    def d_loss(self, real, fake):
        pred_fake = self.netD(jax.lax.stop_gradient(fake))
        pred_real = self.netD(real)
        return 0.5 * (self.gan_loss(pred_fake, False) +
                      self.gan_loss(pred_real, True))

    def g_loss(self, fake):
        return self.gan_loss(self.netD(fake), True)
