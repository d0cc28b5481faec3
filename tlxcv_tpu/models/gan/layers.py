"""StyleGAN2 building blocks (reference tlxcv/models/gan/models/layers/
{upfirdn2d.py:8-42, fused_act.py:26, equalized.py:10-42}).

upfirdn2d is the pad/reshape/conv composition re-expression of the
original CUDA op (already de-CUDA-fied in the reference); on TPU, XLA
fuses the whole chain.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ... import nn
from ...core import init as I
from ...core.module import Module, Param

__all__ = ["upfirdn2d", "fused_leaky_relu", "FusedLeakyReLU", "EqualConv2d",
           "EqualLinear", "make_blur_kernel", "Upfirdn2dUpsample",
           "Upfirdn2dDownsample", "Upfirdn2dBlur"]


def make_blur_kernel(k=(1, 3, 3, 1)):
    k = np.asarray(k, np.float32)
    if k.ndim == 1:
        k = np.outer(k, k)
    return k / k.sum()


def upfirdn2d(x, kernel, up=1, down=1, pad=(0, 0)):
    """NHWC up-fir-down (reference upfirdn2d.py:8-42 semantics)."""
    n, h, w, c = x.shape
    kh, kw = kernel.shape
    # upsample by zero-insertion
    if up > 1:
        x = x.reshape(n, h, 1, w, 1, c)
        x = jnp.pad(x, [(0, 0), (0, 0), (0, up - 1), (0, 0), (0, up - 1), (0, 0)])
        x = x.reshape(n, h * up, w * up, c)
    p0, p1 = pad
    x = jnp.pad(x, [(0, 0), (max(p0, 0), max(p1, 0)),
                    (max(p0, 0), max(p1, 0)), (0, 0)])
    if p0 < 0 or p1 < 0:
        x = x[:, max(-p0, 0):x.shape[1] - max(-p1, 0),
              max(-p0, 0):x.shape[2] - max(-p1, 0)]
    # depthwise FIR
    k = jnp.asarray(kernel, x.dtype)[::-1, ::-1][..., None, None]
    k = jnp.tile(k, (1, 1, 1, x.shape[-1]))
    x = lax.conv_general_dilated(
        x, k, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1])
    if down > 1:
        x = x[:, ::down, ::down]
    return x


def fused_leaky_relu(x, bias=None, negative_slope=0.2, scale=2 ** 0.5):
    """(reference fused_act.py:26)."""
    if bias is not None:
        x = x + bias.reshape((1,) * (x.ndim - 1) + (-1,))
    return jax.nn.leaky_relu(x, negative_slope) * scale


class FusedLeakyReLU(Module):
    def __init__(self, channels, negative_slope=0.2, scale=2 ** 0.5):
        self.bias = Param(I.zeros((channels,)))
        self.negative_slope = negative_slope
        self.scale = scale

    def __call__(self, x):
        return fused_leaky_relu(x, self.bias.value, self.negative_slope,
                                self.scale)


class EqualConv2d(Module):
    """Conv with equalized learning rate (reference equalized.py:10)."""

    def __init__(self, cin, cout, kernel_size, stride=1, padding=0, bias=True):
        self.weight = Param(I.normal((kernel_size, kernel_size, cin, cout),
                                     std=1.0))
        self.scale = 1 / math.sqrt(cin * kernel_size ** 2)
        self.stride = stride
        self.padding = padding
        self.bias = Param(I.zeros((cout,))) if bias else None

    def __call__(self, x):
        w = self.weight.value.astype(x.dtype) * self.scale
        y = lax.conv_general_dilated(
            x, w, (self.stride, self.stride),
            [(self.padding, self.padding)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.bias is not None:
            y = y + self.bias.value.astype(y.dtype)
        return y


class EqualLinear(Module):
    """(reference equalized.py:42)."""

    def __init__(self, in_dim, out_dim, bias=True, bias_init=0.0, lr_mul=1.0,
                 activation=None):
        self.weight = Param(I.normal((in_dim, out_dim), std=1.0 / lr_mul))
        self.scale = 1 / math.sqrt(in_dim) * lr_mul
        self.lr_mul = lr_mul
        self.bias = Param(I.constant((out_dim,), bias_init)) if bias else None
        self.activation = activation

    def __call__(self, x):
        y = x @ (self.weight.value.astype(x.dtype) * self.scale)
        b = None if self.bias is None else self.bias.value * self.lr_mul
        if self.activation == "fused_lrelu":
            return fused_leaky_relu(y, b)
        if b is not None:
            y = y + b.astype(y.dtype)
        return y


class Upfirdn2dUpsample(Module):
    def __init__(self, kernel=(1, 3, 3, 1), factor=2):
        self.kernel = make_blur_kernel(kernel) * (factor ** 2)
        self.factor = factor
        p = self.kernel.shape[0] - factor
        self.pad = ((p + 1) // 2 + factor - 1, p // 2)

    def __call__(self, x):
        return upfirdn2d(x, self.kernel, up=self.factor, pad=self.pad)


class Upfirdn2dDownsample(Module):
    def __init__(self, kernel=(1, 3, 3, 1), factor=2):
        self.kernel = make_blur_kernel(kernel)
        self.factor = factor
        p = self.kernel.shape[0] - factor
        self.pad = ((p + 1) // 2, p // 2)

    def __call__(self, x):
        return upfirdn2d(x, self.kernel, down=self.factor, pad=self.pad)


class Upfirdn2dBlur(Module):
    def __init__(self, kernel=(1, 3, 3, 1), pad=(2, 1), upsample_factor=1):
        k = make_blur_kernel(kernel)
        if upsample_factor > 1:
            k = k * (upsample_factor ** 2)
        self.kernel = k
        self.pad = pad

    def __call__(self, x):
        return upfirdn2d(x, self.kernel, pad=self.pad)
