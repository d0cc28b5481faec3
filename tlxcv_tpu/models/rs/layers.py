"""Shared remote-sensing blocks (reference tlxcv/models/rs/cd/models/
layers/{blocks.py, attention.py}), NHWC."""
from __future__ import annotations

import jax.numpy as jnp

from ... import nn

__all__ = ["Conv1x1", "Conv3x3", "Conv7x7", "MaxPool2x2", "ConvTransposed3x3",
           "CBAM", "ChannelAttention", "SpatialAttention"]


class _ConvBlock(nn.Module):
    def __init__(self, cin, cout, k, norm=False, act=False, bias=None, **kw):
        if bias is None:
            bias = not norm  # reference blocks.py BasicConv 'auto' bias
        self.conv = nn.Conv2d(cin, cout, k, padding=k // 2, bias=bias, **kw)
        self.norm = nn.BatchNorm(cout) if norm else None
        self.act = act

    def __call__(self, x):
        x = self.conv(x)
        if self.norm is not None:
            x = self.norm(x)
        return nn.relu(x) if self.act else x


class Conv1x1(_ConvBlock):
    def __init__(self, cin, cout, norm=False, act=False, **kw):
        super().__init__(cin, cout, 1, norm, act, **kw)


class Conv3x3(_ConvBlock):
    def __init__(self, cin, cout, norm=False, act=False, **kw):
        super().__init__(cin, cout, 3, norm, act, **kw)


class Conv7x7(_ConvBlock):
    def __init__(self, cin, cout, norm=False, act=False, **kw):
        super().__init__(cin, cout, 7, norm, act, **kw)


class MaxPool2x2(nn.MaxPool2d):
    def __init__(self):
        super().__init__(2, 2)


class ConvTransposed3x3(nn.Module):
    def __init__(self, cin, cout, norm=False, act=False):
        self.conv = nn.ConvTranspose2d(cin, cout, 3, stride=2, padding=1,
                                       output_padding=1, bias=not norm)
        self.norm = nn.BatchNorm(cout) if norm else None
        self.act = act

    def __call__(self, x):
        x = self.conv(x)
        if self.norm is not None:
            x = self.norm(x)
        return nn.relu(x) if self.act else x


class ChannelAttention(nn.Module):
    def __init__(self, channels, ratio=8):
        self.fc1 = nn.Conv2d(channels, channels // ratio, 1, bias=False)
        self.fc2 = nn.Conv2d(channels // ratio, channels, 1, bias=False)

    def __call__(self, x):
        avg = self.fc2(nn.relu(self.fc1(x.mean(axis=(1, 2), keepdims=True))))
        mx = self.fc2(nn.relu(self.fc1(x.max(axis=(1, 2), keepdims=True))))
        return nn.sigmoid(avg + mx)


class SpatialAttention(nn.Module):
    def __init__(self, kernel_size=7):
        self.conv = nn.Conv2d(2, 1, kernel_size, padding=kernel_size // 2,
                              bias=False)

    def __call__(self, x):
        avg = x.mean(axis=-1, keepdims=True)
        mx = x.max(axis=-1, keepdims=True)
        return nn.sigmoid(self.conv(jnp.concatenate([avg, mx], -1)))


class CBAM(nn.Module):
    def __init__(self, channels, ratio=8, kernel_size=7):
        self.ca = ChannelAttention(channels, ratio)
        self.sa = SpatialAttention(kernel_size)

    def __call__(self, x):
        x = x * self.ca(x)
        return x * self.sa(x)
