"""Shared segmentation layers (reference
tlxcv/models/segmentation/layers/{layer_libs.py, pyramid_pool.py}), NHWC."""
from __future__ import annotations

import jax.numpy as jnp

from ... import nn
from ...ops.image import interpolate

__all__ = ["ConvBNReLU", "ConvBN", "SeparableConvBNReLU", "DepthwiseConvBN",
           "AuxLayer", "ASPPModule", "PPModule"]


class ConvBNReLU(nn.Module):
    def __init__(self, in_channels, out_channels, kernel_size, padding="same",
                 stride=1, dilation=1, groups=1, act="relu"):
        if padding == "same":
            padding = (kernel_size - 1) // 2 * dilation
        self.conv = nn.Conv2d(in_channels, out_channels, kernel_size,
                              stride=stride, padding=padding,
                              dilation=dilation, groups=groups, bias=False)
        self.bn = nn.BatchNorm(out_channels)
        self.act = nn.get_activation(act)

    def __call__(self, x):
        return self.act(self.bn(self.conv(x)))


class ConvBN(nn.Module):
    def __init__(self, in_channels, out_channels, kernel_size, padding="same",
                 stride=1, dilation=1, groups=1):
        if padding == "same":
            padding = (kernel_size - 1) // 2 * dilation
        self.conv = nn.Conv2d(in_channels, out_channels, kernel_size,
                              stride=stride, padding=padding,
                              dilation=dilation, groups=groups, bias=False)
        self.bn = nn.BatchNorm(out_channels)

    def __call__(self, x):
        return self.bn(self.conv(x))


class DepthwiseConvBN(nn.Module):
    def __init__(self, in_channels, kernel_size, stride=1, dilation=1):
        self.conv = ConvBN(in_channels, in_channels, kernel_size,
                           stride=stride, dilation=dilation,
                           groups=in_channels)

    def __call__(self, x):
        return self.conv(x)


class SeparableConvBNReLU(nn.Module):
    def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                 dilation=1):
        self.depthwise = ConvBNReLU(in_channels, in_channels, kernel_size,
                                    stride=stride, dilation=dilation,
                                    groups=in_channels)
        self.pointwise = ConvBNReLU(in_channels, out_channels, 1, padding=0)

    def __call__(self, x):
        return self.pointwise(self.depthwise(x))


class AuxLayer(nn.Module):
    """Aux seg head: 3x3 conv -> dropout -> 1x1 classifier."""

    def __init__(self, in_channels, inter_channels, out_channels,
                 dropout_prob=0.1):
        self.conv = ConvBNReLU(in_channels, inter_channels, 3)
        self.dropout = nn.Dropout(dropout_prob)
        self.classifier = nn.Conv2d(inter_channels, out_channels, 1)

    def __call__(self, x):
        return self.classifier(self.dropout(self.conv(x)))


class ASPPModule(nn.Module):
    """Atrous spatial pyramid pooling (reference pyramid_pool.py ASPP)."""

    def __init__(self, aspp_ratios, in_channels, out_channels,
                 use_sep_conv=False, image_pooling=True):
        self.blocks = []
        for ratio in aspp_ratios:
            if use_sep_conv and ratio > 1:
                self.blocks.append(SeparableConvBNReLU(
                    in_channels, out_channels, 3, dilation=ratio))
            else:
                self.blocks.append(ConvBNReLU(
                    in_channels, out_channels, 1 if ratio == 1 else 3,
                    dilation=ratio))
        self.image_pooling = image_pooling
        if image_pooling:
            self.global_conv = ConvBNReLU(in_channels, out_channels, 1,
                                          padding=0)
        n = len(aspp_ratios) + int(image_pooling)
        self.project = ConvBNReLU(out_channels * n, out_channels, 1, padding=0)
        self.dropout = nn.Dropout(0.1)

    def __call__(self, x):
        outs = [blk(x) for blk in self.blocks]
        if self.image_pooling:
            gp = jnp.mean(x, axis=(1, 2), keepdims=True)
            gp = self.global_conv(gp)
            gp = jnp.broadcast_to(gp, outs[0].shape[:3] + (gp.shape[-1],))
            outs.append(gp)
        return self.dropout(self.project(jnp.concatenate(outs, -1)))


class PPModule(nn.Module):
    """Pyramid pooling (PSP-style, reference pyramid_pool.py PPModule)."""

    def __init__(self, in_channels, out_channels, bin_sizes=(1, 2, 3, 6),
                 dim_reduction=True, align_corners=False):
        self.bin_sizes = tuple(bin_sizes)
        inter = in_channels // len(bin_sizes) if dim_reduction else in_channels
        self.stages = [ConvBNReLU(in_channels, inter, 1, padding=0)
                       for _ in bin_sizes]
        self.align_corners = align_corners
        self.project = ConvBNReLU(
            in_channels + inter * len(bin_sizes), out_channels, 3)

    def __call__(self, x):
        outs = [x]
        for size, stage in zip(self.bin_sizes, self.stages):
            pooled = nn.AdaptiveAvgPool2d((size, size))(x)
            feat = stage(pooled)
            outs.append(interpolate(feat, size=x.shape[1:3], mode="bilinear",
                                    align_corners=self.align_corners))
        return self.project(jnp.concatenate(outs, -1))
