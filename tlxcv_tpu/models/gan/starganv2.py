"""StarGAN v2 (reference tlxcv/models/gan/models/
{generators/generator_starganv2.py, discriminators/
discriminator_starganv2.py, starganv2_model.py}), NHWC — faithful
topology: AdaIN generator with the w_hpf high-pass masked-skip path,
normalize-flagged ResBlks (generator encoder normalizes, style encoder /
discriminator do NOT, reference ResBlk default), 4+4-layer mapping
network, single-linear style heads.
"""
from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np
from jax import lax

from ... import nn
from ...core.module import Module
from ...ops.image import interpolate
from .registry import DISCRIMINATORS, GENERATORS

__all__ = ["StarGANv2Generator", "MappingNetwork", "StyleEncoder",
           "StarGANv2Discriminator", "HighPass"]


class AdaIN(Module):
    def __init__(self, style_dim, num_features):
        self.fc = nn.Linear(style_dim, num_features * 2)
        self.norm = nn.InstanceNorm(num_features, affine=False)

    def __call__(self, x, s):
        h = self.fc(s)
        gamma, beta = jnp.split(h[:, None, None, :], 2, axis=-1)
        return (1 + gamma) * self.norm(x) + beta


class AdainResBlock(Module):
    """(reference AdainResBlk :82-132 — with w_hpf > 0 the block is
    NON-residual, matching the reference's `if self.w_hpf == 0` gate)."""

    def __init__(self, cin, cout, style_dim, w_hpf=0, upsample=False):
        self.upsample = upsample
        self.w_hpf = w_hpf
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
        if self.w_hpf != 0:
            return y
        sk = up(x)
        if self.skip is not None:
            sk = self.skip(sk)
        return (y + sk) / math.sqrt(2)


class ResBlock(Module):
    """(reference ResBlk :11-60 — ``normalize`` defaults False; only the
    generator encoder normalizes)."""

    def __init__(self, cin, cout, normalize=False, downsample=False):
        self.downsample = downsample
        self.norm1 = nn.InstanceNorm(cin) if normalize else None
        self.conv1 = nn.Conv2d(cin, cin, 3, padding=1)
        self.norm2 = nn.InstanceNorm(cin) if normalize else None
        self.conv2 = nn.Conv2d(cin, cout, 3, padding=1)
        self.skip = nn.Conv2d(cin, cout, 1, bias=False) if cin != cout else None

    def __call__(self, x):
        def down(v):
            return nn.AvgPool2d(2, 2)(v) if self.downsample else v

        y = x if self.norm1 is None else self.norm1(x)
        y = self.conv1(nn.leaky_relu(y, 0.2))
        y = down(y)
        if self.norm2 is not None:
            y = self.norm2(y)
        y = self.conv2(nn.leaky_relu(y, 0.2))
        sk = down(x)
        if self.skip is not None:
            sk = self.skip(sk)
        return (y + sk) / math.sqrt(2)


class HighPass(Module):
    """Fixed 3x3 high-pass filter over cached encoder features
    (reference HighPass :136-146)."""

    def __init__(self, w_hpf):
        self.kernel = np.asarray([[-1, -1, -1], [-1, 8.0, -1],
                                  [-1, -1, -1]], np.float32) / w_hpf

    def __call__(self, x):
        c = x.shape[-1]
        k = jnp.asarray(self.kernel, x.dtype)[..., None, None]
        k = jnp.tile(k, (1, 1, 1, c))
        return lax.conv_general_dilated(
            x, k, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c)


@GENERATORS.register
class StarGANv2Generator(Module):
    """(reference StarGANv2Generator :148-200).  ``dim_in`` defaults to
    the reference's 2^14/img_size (clamped); pass a small value for
    micro configs.  ``masks`` enables the w_hpf face-structure skip."""

    def __init__(self, img_size=64, style_dim=64, max_conv_dim=256,
                 dim_in=None, w_hpf=1):
        if dim_in is None:
            dim_in = min(2 ** 14 // img_size, max_conv_dim)
        self.img_size = img_size
        self.w_hpf = w_hpf
        self.from_rgb = nn.Conv2d(3, dim_in, 3, padding=1)
        repeat = int(math.log2(img_size)) - 4
        if w_hpf > 0:
            repeat += 1
        repeat = max(repeat, 1)
        self.encode = []
        self.decode = []
        d = dim_in
        for _ in range(repeat):
            dout = min(d * 2, max_conv_dim)
            self.encode.append(ResBlock(d, dout, normalize=True,
                                        downsample=True))
            self.decode.insert(0, AdainResBlock(dout, d, style_dim,
                                                w_hpf=w_hpf, upsample=True))
            d = dout
        for _ in range(2):
            self.encode.append(ResBlock(d, d, normalize=True))
            self.decode.insert(0, AdainResBlock(d, d, style_dim,
                                                w_hpf=w_hpf))
        self.to_rgb_norm = nn.InstanceNorm(dim_in)
        self.to_rgb_conv = nn.Conv2d(dim_in, 3, 1)
        self.hpf = HighPass(w_hpf) if w_hpf > 0 else None

    def __call__(self, x, s, masks=None):
        x = self.from_rgb(x)
        cache = {}
        for blk in self.encode:
            if masks is not None and x.shape[1] in (32, 64, 128):
                cache[x.shape[1]] = x
            x = blk(x)
        for blk in self.decode:
            x = blk(x, s)
            if masks is not None and x.shape[1] in (32, 64, 128):
                mask = masks[0] if x.shape[1] == 32 else masks[1]
                mask = interpolate(mask, size=x.shape[1:3], mode="bilinear")
                x = x + self.hpf(mask * cache[x.shape[1]])
        return self.to_rgb_conv(nn.leaky_relu(self.to_rgb_norm(x), 0.2))


class MappingNetwork(Module):
    """Latent -> per-domain styles (reference StarGANv2Mapping :203-237:
    4 shared 512-wide layers + 4-layer per-domain heads)."""

    def __init__(self, latent_dim=16, style_dim=64, num_domains=2,
                 hidden=512):
        layers = [nn.Linear(latent_dim, hidden), nn.Activation("relu")]
        for _ in range(3):
            layers += [nn.Linear(hidden, hidden), nn.Activation("relu")]
        self.shared = nn.Sequential(*layers)
        self.heads = [nn.Sequential(
            nn.Linear(hidden, hidden), nn.Activation("relu"),
            nn.Linear(hidden, hidden), nn.Activation("relu"),
            nn.Linear(hidden, hidden), nn.Activation("relu"),
            nn.Linear(hidden, style_dim)) for _ in range(num_domains)]

    def __call__(self, z, y):
        h = self.shared(z)
        styles = jnp.stack([head(h) for head in self.heads], 1)  # [B, D, S]
        return jnp.take_along_axis(
            styles, y[:, None, None].astype(jnp.int32).repeat(
                styles.shape[-1], -1), 1)[:, 0]


class StyleEncoder(Module):
    """(reference StarGANv2Style :240-285 — non-normalized ResBlks,
    single linear per domain)."""

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
