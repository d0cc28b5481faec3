"""StarGAN v2 (reference tlxcv/models/gan/models/
{generator_starganv2.py:279, discriminator_starganv2.py,
starganv2_model.py}), NHWC: AdaIN generator, mapping network, style
encoder, multi-domain discriminator."""
from __future__ import annotations

import math

import jax.numpy as jnp

from ... import nn
from ...core.module import Module
from ...ops.image import interpolate
from .registry import DISCRIMINATORS, GENERATORS

__all__ = ["StarGANv2Generator", "MappingNetwork", "StyleEncoder",
           "StarGANv2Discriminator"]


class AdaIN(Module):
    def __init__(self, style_dim, num_features):
        self.fc = nn.Linear(style_dim, num_features * 2)
        self.norm = nn.InstanceNorm(num_features, affine=False)

    def __call__(self, x, s):
        h = self.fc(s)
        gamma, beta = jnp.split(h[:, None, None, :], 2, axis=-1)
        return (1 + gamma) * self.norm(x) + beta


class AdainResBlock(Module):
    def __init__(self, cin, cout, style_dim, upsample=False):
        self.upsample = upsample
        self.norm1 = AdaIN(style_dim, cin)
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        self.norm2 = AdaIN(style_dim, cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        self.skip = nn.Conv2d(cin, cout, 1, bias=False) if cin != cout else None

    def __call__(self, x, s):
        def up(v):
            return interpolate(v, scale_factor=2, mode="nearest") \
                if self.upsample else v

        y = nn.leaky_relu(self.norm1(x, s), 0.2)
        y = self.conv1(up(y))
        y = nn.leaky_relu(self.norm2(y, s), 0.2)
        y = self.conv2(y)
        sk = up(x)
        if self.skip is not None:
            sk = self.skip(sk)
        return (y + sk) / math.sqrt(2)


class ResBlock(Module):
    def __init__(self, cin, cout, downsample=False):
        self.downsample = downsample
        self.norm1 = nn.InstanceNorm(cin)
        self.conv1 = nn.Conv2d(cin, cin, 3, padding=1)
        self.norm2 = nn.InstanceNorm(cin)
        self.conv2 = nn.Conv2d(cin, cout, 3, padding=1)
        self.skip = nn.Conv2d(cin, cout, 1, bias=False) if cin != cout else None

    def __call__(self, x):
        def down(v):
            return nn.AvgPool2d(2, 2)(v) if self.downsample else v

        y = self.conv1(nn.leaky_relu(self.norm1(x), 0.2))
        y = down(y)
        y = self.conv2(nn.leaky_relu(self.norm2(y), 0.2))
        sk = down(x)
        if self.skip is not None:
            sk = self.skip(sk)
        return (y + sk) / math.sqrt(2)


@GENERATORS.register
class StarGANv2Generator(Module):
    def __init__(self, img_size=64, style_dim=64, max_conv_dim=256, dim_in=32):
        self.stem = nn.Conv2d(3, dim_in, 3, padding=1)
        repeat = int(math.log2(img_size)) - 4
        self.encode = []
        self.decode = []
        d = dim_in
        for _ in range(max(repeat, 1)):
            dout = min(d * 2, max_conv_dim)
            self.encode.append(ResBlock(d, dout, downsample=True))
            self.decode.insert(0, AdainResBlock(dout, d, style_dim,
                                                upsample=True))
            d = dout
        self.bottleneck_e = [ResBlock(d, d) for _ in range(2)]
        self.bottleneck_d = [AdainResBlock(d, d, style_dim) for _ in range(2)]
        self.out_norm = nn.InstanceNorm(dim_in)
        self.out_conv = nn.Conv2d(dim_in, 3, 1)

    def __call__(self, x, s):
        x = self.stem(x)
        for blk in self.encode:
            x = blk(x)
        for blk in self.bottleneck_e:
            x = blk(x)
        for blk in self.bottleneck_d:
            x = blk(x, s)
        for blk in self.decode:
            x = blk(x, s)
        return self.out_conv(nn.leaky_relu(self.out_norm(x), 0.2))


class MappingNetwork(Module):
    """Latent -> per-domain styles (reference generator_starganv2)."""

    def __init__(self, latent_dim=16, style_dim=64, num_domains=2, hidden=256):
        self.shared = nn.Sequential(
            nn.Linear(latent_dim, hidden), nn.Activation("relu"),
            nn.Linear(hidden, hidden), nn.Activation("relu"))
        self.heads = [nn.Sequential(
            nn.Linear(hidden, hidden), nn.Activation("relu"),
            nn.Linear(hidden, style_dim)) for _ in range(num_domains)]

    def __call__(self, z, y):
        h = self.shared(z)
        styles = jnp.stack([head(h) for head in self.heads], 1)  # [B, D, S]
        return jnp.take_along_axis(
            styles, y[:, None, None].astype(jnp.int32).repeat(
                styles.shape[-1], -1), 1)[:, 0]


class StyleEncoder(Module):
    def __init__(self, img_size=64, style_dim=64, num_domains=2, dim_in=32,
                 max_conv_dim=256):
        blocks = [nn.Conv2d(3, dim_in, 3, padding=1)]
        d = dim_in
        repeat = int(math.log2(img_size)) - 2
        for _ in range(repeat):
            dout = min(d * 2, max_conv_dim)
            blocks.append(ResBlock(d, dout, downsample=True))
            d = dout
        self.blocks = nn.Sequential(*blocks)
        self.conv = nn.Conv2d(d, d, 4)
        self.heads = [nn.Linear(d, style_dim) for _ in range(num_domains)]

    def __call__(self, x, y):
        h = self.blocks(x)
        h = nn.leaky_relu(self.conv(nn.leaky_relu(h, 0.2)), 0.2)
        h = h.reshape(h.shape[0], -1)
        styles = jnp.stack([head(h) for head in self.heads], 1)
        return jnp.take_along_axis(
            styles, y[:, None, None].astype(jnp.int32).repeat(
                styles.shape[-1], -1), 1)[:, 0]


@DISCRIMINATORS.register
class StarGANv2Discriminator(Module):
    def __init__(self, img_size=64, num_domains=2, dim_in=32,
                 max_conv_dim=256):
        blocks = [nn.Conv2d(3, dim_in, 3, padding=1)]
        d = dim_in
        repeat = int(math.log2(img_size)) - 2
        for _ in range(repeat):
            dout = min(d * 2, max_conv_dim)
            blocks.append(ResBlock(d, dout, downsample=True))
            d = dout
        self.blocks = nn.Sequential(*blocks)
        self.conv = nn.Conv2d(d, d, 4)
        self.head = nn.Linear(d, num_domains)

    def __call__(self, x, y):
        h = self.blocks(x)
        h = nn.leaky_relu(self.conv(nn.leaky_relu(h, 0.2)), 0.2)
        out = self.head(h.reshape(h.shape[0], -1))  # [B, D]
        return jnp.take_along_axis(out, y[:, None].astype(jnp.int32), 1)[:, 0]
