"""UNet (valid-padding, crop-concat) — the hermetic Circles demo model.

Re-design of reference tlxcv/models/segmentation/unet.py (ConvBlock :15,
UpconvBlock :66, CropConcatBlock :102, Unet :135) in NHWC.  The decoder
blocks are keyed by layer index (the reference indexes its reversed
ModuleList with forward indices — we keep the canonical topology).
"""
from __future__ import annotations

import math

import jax.numpy as jnp

from ... import nn
from ...core import init as I

__all__ = ["Unet", "unet"]


def _filters(layer_idx, filters_root):
    return 2 ** layer_idx * filters_root


def _trunc_init(filters, kernel_size):
    std = math.sqrt(2 / (kernel_size ** 2 * filters))
    return lambda shape: I.truncated_normal(shape, std=std)


class ConvBlock(nn.Module):
    def __init__(self, in_ch, layer_idx, filters_root, kernel_size,
                 dropout_rate, padding, activation):
        f = _filters(layer_idx, filters_root)
        pad = 0 if padding.upper() == "VALID" else kernel_size // 2
        self.conv1 = nn.Conv2d(in_ch, f, kernel_size, padding=pad,
                               w_init=_trunc_init(f, kernel_size))
        self.drop1 = nn.Dropout(dropout_rate)
        self.conv2 = nn.Conv2d(f, f, kernel_size, padding=pad,
                               w_init=_trunc_init(f, kernel_size))
        self.drop2 = nn.Dropout(dropout_rate)
        self.act = nn.get_activation(activation)
        self.out_ch = f

    def __call__(self, x):
        x = self.act(self.drop1(self.conv1(x)))
        x = self.act(self.drop2(self.conv2(x)))
        return x


class UpconvBlock(nn.Module):
    def __init__(self, in_ch, layer_idx, filters_root, kernel_size, pool_size,
                 activation):
        f = _filters(layer_idx + 1, filters_root)
        self.upconv = nn.ConvTranspose2d(in_ch, f // 2, pool_size,
                                         stride=pool_size,
                                         w_init=_trunc_init(f, kernel_size))
        self.act = nn.get_activation(activation)
        self.out_ch = f // 2

    def __call__(self, x):
        return self.act(self.upconv(x))


def crop_concat(x, down_layer):
    """Center-crop the skip connection to x's spatial size and concat (NHWC)."""
    hd = (down_layer.shape[1] - x.shape[1]) // 2
    wd = (down_layer.shape[2] - x.shape[2]) // 2
    cropped = down_layer[:, hd:hd + x.shape[1], wd:wd + x.shape[2], :]
    return jnp.concatenate([cropped, x], axis=-1)


class Unet(nn.Module):
    def __init__(self, nx=172, ny=172, channels=1, num_classes=2,
                 layer_depth=3, filters_root=64, kernel_size=3, pool_size=2,
                 dropout_rate=0.5, padding="VALID", activation="relu"):
        self.layer_depth = layer_depth
        self.num_classes = num_classes
        kw = dict(filters_root=filters_root, kernel_size=kernel_size,
                  dropout_rate=dropout_rate, padding=padding,
                  activation=activation)

        self.down_blocks = []
        self.pools = []
        cin = channels
        for li in range(layer_depth - 1):
            blk = ConvBlock(cin, li, **kw)
            self.down_blocks.append(blk)
            self.pools.append(nn.MaxPool2d(pool_size, pool_size))
            cin = blk.out_ch
        self.bottleneck = ConvBlock(cin, layer_depth - 1, **kw)
        cin = self.bottleneck.out_ch

        self.up_blocks = []   # ordered deepest-first (layer_depth-2 .. 0)
        self.dec_blocks = []
        for li in range(layer_depth - 2, -1, -1):
            up = UpconvBlock(cin, li, filters_root, kernel_size, pool_size,
                             activation)
            self.up_blocks.append(up)
            skip_ch = self.down_blocks[li].out_ch
            dec = ConvBlock(up.out_ch + skip_ch, li, **kw)
            self.dec_blocks.append(dec)
            cin = dec.out_ch

        self.head = nn.Conv2d(cin, num_classes, 1,
                              w_init=_trunc_init(filters_root, kernel_size))
        self.act = nn.get_activation(activation)

    def __call__(self, x):
        skips = []
        for blk, pool in zip(self.down_blocks, self.pools):
            x = blk(x)
            skips.append(x)
            x = pool(x)
        x = self.bottleneck(x)
        for i, (up, dec) in enumerate(zip(self.up_blocks, self.dec_blocks)):
            li = self.layer_depth - 2 - i
            x = up(x)
            x = crop_concat(x, skips[li])
            x = dec(x)
        return self.act(self.head(x))


def unet(**kwargs):
    return Unet(**kwargs)
