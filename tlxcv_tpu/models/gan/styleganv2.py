"""StyleGAN v2 generator/discriminator (reference tlxcv/models/gan/models/
{generator_styleganv2.py:370, discriminator_styleganv2.py:103,
styleganv2_model.py}), NHWC on the equalized/upfirdn bricks."""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax import lax

from ... import nn
from ...core import init as I
from ...core.module import Module, Param, has_rng, rng
from .layers import (EqualConv2d, EqualLinear, FusedLeakyReLU,
                     Upfirdn2dBlur, fused_leaky_relu, make_blur_kernel,
                     upfirdn2d)
from .registry import DISCRIMINATORS, GENERATORS

__all__ = ["StyleGANv2Generator", "StyleGANv2Discriminator"]


class PixelNorm(Module):
    def __call__(self, x):
        return x * lax.rsqrt(jnp.mean(x * x, axis=-1, keepdims=True) + 1e-8)


class ModulatedConv2d(Module):
    """Weight modulation/demodulation conv (the StyleGAN2 core op)."""

    def __init__(self, cin, cout, kernel_size, style_dim, demodulate=True,
                 upsample=False, blur_kernel=(1, 3, 3, 1)):
        self.kernel_size = kernel_size
        self.demodulate = demodulate
        self.upsample = upsample
        fan_in = cin * kernel_size ** 2
        self.scale = 1 / math.sqrt(fan_in)
        self.weight = Param(I.normal((kernel_size, kernel_size, cin, cout),
                                     std=1.0))
        self.modulation = EqualLinear(style_dim, cin, bias_init=1.0)
        if upsample:
            p = len(blur_kernel) - 2 - (kernel_size - 1)
            self.blur = Upfirdn2dBlur(blur_kernel,
                                      pad=((p + 1) // 2 + 1, p // 2 + 1),
                                      upsample_factor=2)

    def __call__(self, x, style):
        b, h, w, cin = x.shape
        k = self.kernel_size
        style = self.modulation(style)  # [B, cin]
        weight = self.weight.value * self.scale  # [k, k, cin, cout]
        # per-sample modulated weights [B, k, k, cin, cout]
        wmod = weight[None] * style[:, None, None, :, None]
        if self.demodulate:
            demod = lax.rsqrt(jnp.sum(wmod ** 2, axis=(1, 2, 3)) + 1e-8)
            wmod = wmod * demod[:, None, None, None, :]
        # grouped conv trick: fold batch into channels
        cout = wmod.shape[-1]
        if self.upsample:
            # per-sample transposed conv: move batch into feature groups
            xg = x.transpose(1, 2, 0, 3).reshape(1, h, w, b * cin)
            # HWIO for grouped transpose: treat each sample as a group
            wt = wmod.transpose(1, 2, 3, 0, 4).reshape(k, k, cin, b * cout)
            y = lax.conv_general_dilated(
                xg, jnp.flip(wt, (0, 1)),
                window_strides=(1, 1),
                padding=[(k - 1, k - 1)] * 2,
                lhs_dilation=(2, 2),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=b)
            oh, ow = y.shape[1:3]
            y = y.reshape(oh, ow, b, cout).transpose(2, 0, 1, 3)
            y = self.blur(y)
        else:
            xg = x.transpose(1, 2, 0, 3).reshape(1, h, w, b * cin)
            wt = wmod.transpose(1, 2, 3, 0, 4).reshape(k, k, cin, b * cout)
            y = lax.conv_general_dilated(
                xg, wt, (1, 1), [(k // 2, k // 2)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=b)
            oh, ow = y.shape[1:3]
            y = y.reshape(oh, ow, b, cout).transpose(2, 0, 1, 3)
        return y


class NoiseInjection(Module):
    def __init__(self):
        self.weight = Param(I.zeros((1,)))

    def __call__(self, x, noise=None):
        if noise is None:
            if has_rng():
                noise = jax.random.normal(rng("noise"),
                                          x.shape[:3] + (1,), x.dtype)
            else:
                return x
        return x + self.weight.value * noise


class StyledConv(Module):
    def __init__(self, cin, cout, kernel_size, style_dim, upsample=False):
        self.conv = ModulatedConv2d(cin, cout, kernel_size, style_dim,
                                    upsample=upsample)
        self.noise = NoiseInjection()
        self.activate = FusedLeakyReLU(cout)

    def __call__(self, x, style, noise=None):
        return self.activate(self.noise(self.conv(x, style), noise))


class ToRGB(Module):
    def __init__(self, cin, style_dim, upsample=True):
        self.conv = ModulatedConv2d(cin, 3, 1, style_dim, demodulate=False)
        self.bias = Param(I.zeros((3,)))
        self.upsample = upsample
        if upsample:
            k = make_blur_kernel((1, 3, 3, 1)) * 4
            self.kernel = k
            p = k.shape[0] - 2
            self.pad = ((p + 1) // 2 + 1, p // 2)

    def __call__(self, x, style, skip=None):
        out = self.conv(x, style) + self.bias.value
        if skip is not None:
            if self.upsample:
                skip = upfirdn2d(skip, self.kernel, up=2, pad=self.pad)
            out = out + skip
        return out


@GENERATORS.register
class StyleGANv2Generator(Module):
    def __init__(self, size=64, style_dim=64, n_mlp=4, channel_multiplier=2):
        self.size = size
        self.style_dim = style_dim
        layers = [PixelNorm()]
        for _ in range(n_mlp):
            layers.append(EqualLinear(style_dim, style_dim, lr_mul=0.01,
                                      activation="fused_lrelu"))
        self.style = layers
        channels = {4: 512, 8: 512, 16: 512, 32: 512,
                    64: 256 * channel_multiplier // 2,
                    128: 128 * channel_multiplier // 2,
                    256: 64 * channel_multiplier // 2}
        self.channels = channels
        self.input_const = Param(I.normal((1, 4, 4, channels[4]), std=1.0))
        self.conv1 = StyledConv(channels[4], channels[4], 3, style_dim)
        self.to_rgb1 = ToRGB(channels[4], style_dim, upsample=False)
        self.log_size = int(math.log2(size))
        self.convs = []
        self.to_rgbs = []
        cin = channels[4]
        for i in range(3, self.log_size + 1):
            cout = channels[2 ** i]
            self.convs.append(StyledConv(cin, cout, 3, style_dim,
                                         upsample=True))
            self.convs.append(StyledConv(cout, cout, 3, style_dim))
            self.to_rgbs.append(ToRGB(cout, style_dim))
            cin = cout

    def mapping(self, z):
        for layer in self.style:
            z = layer(z)
        return z

    def synthesis(self, w):
        """w [B, style_dim] -> image; exposed separately so the
        path-length regularizer can differentiate wrt w
        (reference styleganv2_model.py g_path_regularize)."""
        b = w.shape[0]
        x = jnp.broadcast_to(self.input_const.value,
                             (b,) + self.input_const.value.shape[1:])
        x = self.conv1(x, w)
        skip = self.to_rgb1(x, w)
        for i in range(0, len(self.convs), 2):
            x = self.convs[i](x, w)
            x = self.convs[i + 1](x, w)
            skip = self.to_rgbs[i // 2](x, w, skip)
        return skip

    def __call__(self, z):
        """z [B, style_dim] -> image [B, size, size, 3]."""
        return self.synthesis(self.mapping(z))


class DiscBlock(Module):
    def __init__(self, cin, cout):
        self.conv1 = EqualConv2d(cin, cin, 3, padding=1)
        self.act1 = FusedLeakyReLU(cin)
        # downsample blur pad: p = (len(k) - factor) + (conv_k - 1)
        self.blur = Upfirdn2dBlur((1, 3, 3, 1), pad=(2, 2))       # conv_k=3
        self.conv2 = EqualConv2d(cin, cout, 3, stride=2, padding=0)
        self.act2 = FusedLeakyReLU(cout)
        self.skip_blur = Upfirdn2dBlur((1, 3, 3, 1), pad=(1, 1))  # conv_k=1
        self.skip = EqualConv2d(cin, cout, 1, stride=2, bias=False)

    def __call__(self, x):
        out = self.act1(self.conv1(x))
        out = self.act2(self.conv2(self.blur(out)))
        sk = self.skip(self.skip_blur(x))
        return (out + sk) / math.sqrt(2)


@DISCRIMINATORS.register
class StyleGANv2Discriminator(Module):
    def __init__(self, size=64, channel_multiplier=2):
        channels = {4: 512, 8: 512, 16: 512, 32: 512,
                    64: 256 * channel_multiplier // 2,
                    128: 128 * channel_multiplier // 2,
                    256: 64 * channel_multiplier // 2}
        log_size = int(math.log2(size))
        self.stem = EqualConv2d(3, channels[size], 1)
        self.stem_act = FusedLeakyReLU(channels[size])
        self.blocks = []
        cin = channels[size]
        for i in range(log_size, 2, -1):
            cout = channels[2 ** (i - 1)]
            self.blocks.append(DiscBlock(cin, cout))
            cin = cout
        self.final_conv = EqualConv2d(cin + 1, channels[4], 3, padding=1)
        self.final_act = FusedLeakyReLU(channels[4])
        self.final_linear1 = EqualLinear(channels[4] * 16, channels[4],
                                         activation="fused_lrelu")
        self.final_linear2 = EqualLinear(channels[4], 1)

    def __call__(self, x):
        x = self.stem_act(self.stem(x))
        for blk in self.blocks:
            x = blk(x)
        # minibatch stddev
        b, h, w, c = x.shape
        std = jnp.std(x, axis=0, keepdims=True).mean()
        std_map = jnp.full((b, h, w, 1), std, x.dtype)
        x = jnp.concatenate([x, std_map], -1)
        x = self.final_act(self.final_conv(x))
        x = x.reshape(b, -1)
        return self.final_linear2(self.final_linear1(x))
