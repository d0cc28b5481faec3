"""CycleGAN (reference tlxcv/models/gan/models/{cyclegan_model.py,
generators/resnet.py, discriminators/nlayers.py}), NHWC."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ... import nn
from ...core import init as I
from ...core.module import Module
from ...ops.image import pad2d
from .registry import DISCRIMINATORS, GENERATORS, MODELS

__all__ = ["ResnetGenerator", "NLayerDiscriminator", "CycleGANModel"]

# GAN conv init: normal(0.02) — the CycleGAN/pix2pix convention the
# reference inherits from its backend defaults.  The framework-wide
# kaiming fan_out default saturates the generator's tanh head at init
# (preact std ~2.7 at ngf=32), killing G gradients: the two-domain bar
# measured G loss pinned at ~20 (= cycle L1 at maximum error) for 900
# steps before this fix.
_w02 = lambda s: I.normal(s, std=0.02)  # noqa: E731


class ResnetBlock(Module):
    def __init__(self, dim):
        self.conv1 = nn.Conv2d(dim, dim, 3, bias=False, w_init=_w02)
        self.norm1 = nn.InstanceNorm(dim)
        self.conv2 = nn.Conv2d(dim, dim, 3, bias=False, w_init=_w02)
        self.norm2 = nn.InstanceNorm(dim)

    def __call__(self, x):
        y = pad2d(x, (1, 1, 1, 1), mode="reflect")
        y = nn.relu(self.norm1(self.conv1(y)))
        y = pad2d(y, (1, 1, 1, 1), mode="reflect")
        y = self.norm2(self.conv2(y))
        return x + y


@GENERATORS.register
class ResnetGenerator(Module):
    """(reference generators/resnet.py — 9-block CycleGAN generator)."""

    def __init__(self, input_nc=3, output_nc=3, ngf=64, n_blocks=9):
        self.stem_conv = nn.Conv2d(input_nc, ngf, 7, bias=False, w_init=_w02)
        self.stem_norm = nn.InstanceNorm(ngf)
        self.down1 = nn.Conv2d(ngf, ngf * 2, 3, stride=2, padding=1,
                               bias=False, w_init=_w02)
        self.down1_norm = nn.InstanceNorm(ngf * 2)
        self.down2 = nn.Conv2d(ngf * 2, ngf * 4, 3, stride=2, padding=1,
                               bias=False, w_init=_w02)
        self.down2_norm = nn.InstanceNorm(ngf * 4)
        self.blocks = [ResnetBlock(ngf * 4) for _ in range(n_blocks)]
        self.up1 = nn.ConvTranspose2d(ngf * 4, ngf * 2, 3, stride=2,
                                      padding=1, output_padding=1,
                                      bias=False, w_init=_w02)
        self.up1_norm = nn.InstanceNorm(ngf * 2)
        self.up2 = nn.ConvTranspose2d(ngf * 2, ngf, 3, stride=2, padding=1,
                                      output_padding=1, bias=False,
                                      w_init=_w02)
        self.up2_norm = nn.InstanceNorm(ngf)
        self.head = nn.Conv2d(ngf, output_nc, 7, w_init=_w02)

    def __call__(self, x):
        x = pad2d(x, (3, 3, 3, 3), mode="reflect")
        x = nn.relu(self.stem_norm(self.stem_conv(x)))
        x = nn.relu(self.down1_norm(self.down1(x)))
        x = nn.relu(self.down2_norm(self.down2(x)))
        for blk in self.blocks:
            x = blk(x)
        x = nn.relu(self.up1_norm(self.up1(x)))
        x = nn.relu(self.up2_norm(self.up2(x)))
        x = pad2d(x, (3, 3, 3, 3), mode="reflect")
        return nn.tanh(self.head(x))


@DISCRIMINATORS.register
class NLayerDiscriminator(Module):
    """PatchGAN (reference discriminators/nlayers.py)."""

    def __init__(self, input_nc=3, ndf=64, n_layers=3):
        layers = [nn.Conv2d(input_nc, ndf, 4, stride=2, padding=1,
                             w_init=_w02),
                  nn.Activation(lambda x: nn.leaky_relu(x, 0.2))]
        mult = 1
        for i in range(1, n_layers):
            prev, mult = mult, min(2 ** i, 8)
            layers += [nn.Conv2d(ndf * prev, ndf * mult, 4, stride=2,
                                 padding=1, bias=False, w_init=_w02),
                       nn.InstanceNorm(ndf * mult),
                       nn.Activation(lambda x: nn.leaky_relu(x, 0.2))]
        prev, mult = mult, min(2 ** n_layers, 8)
        layers += [nn.Conv2d(ndf * prev, ndf * mult, 4, stride=1, padding=1,
                             bias=False, w_init=_w02),
                   nn.InstanceNorm(ndf * mult),
                   nn.Activation(lambda x: nn.leaky_relu(x, 0.2)),
                   nn.Conv2d(ndf * mult, 1, 4, stride=1, padding=1,
                             w_init=_w02)]
        self.net = nn.Sequential(*layers)

    def __call__(self, x):
        return self.net(x)


@MODELS.register
class CycleGANModel(Module):
    """Two generators + two discriminators with cycle & identity losses
    (reference cyclegan_model.py)."""

    def __init__(self, ngf=64, ndf=64, n_blocks=9, lambda_a=10.0,
                 lambda_b=10.0, lambda_identity=0.5):
        self.netG_A = ResnetGenerator(ngf=ngf, n_blocks=n_blocks)
        self.netG_B = ResnetGenerator(ngf=ngf, n_blocks=n_blocks)
        self.netD_A = NLayerDiscriminator(ndf=ndf)
        self.netD_B = NLayerDiscriminator(ndf=ndf)
        self.lambda_a = lambda_a
        self.lambda_b = lambda_b
        self.lambda_identity = lambda_identity

    def __call__(self, real_a, real_b=None):
        fake_b = self.netG_A(real_a)
        if real_b is None:
            return fake_b
        fake_a = self.netG_B(real_b)
        return fake_b, fake_a

    @staticmethod
    def _lsgan(pred, real: bool):
        target = 1.0 if real else 0.0
        return jnp.mean((pred - target) ** 2)

    def g_loss(self, real_a, real_b):
        fake_b = self.netG_A(real_a)
        fake_a = self.netG_B(real_b)
        rec_a = self.netG_B(fake_b)
        rec_b = self.netG_A(fake_a)
        idt_a = self.netG_A(real_b)
        idt_b = self.netG_B(real_a)
        loss = (self._lsgan(self.netD_A(fake_b), True) +
                self._lsgan(self.netD_B(fake_a), True) +
                self.lambda_a * jnp.mean(jnp.abs(rec_a - real_a)) +
                self.lambda_b * jnp.mean(jnp.abs(rec_b - real_b)) +
                self.lambda_identity * self.lambda_b *
                jnp.mean(jnp.abs(idt_a - real_b)) +
                self.lambda_identity * self.lambda_a *
                jnp.mean(jnp.abs(idt_b - real_a)))
        return loss

    def d_loss(self, real_a, real_b):
        fake_b = jax.lax.stop_gradient(self.netG_A(real_a))
        fake_a = jax.lax.stop_gradient(self.netG_B(real_b))
        return 0.5 * (self._lsgan(self.netD_A(real_b), True) +
                      self._lsgan(self.netD_A(fake_b), False) +
                      self._lsgan(self.netD_B(real_a), True) +
                      self._lsgan(self.netD_B(fake_a), False))
