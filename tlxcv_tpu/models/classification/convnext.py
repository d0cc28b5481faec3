"""ConvNeXt (reference tlxcv/models/classification/convnext.py,
paddle2tlx-converted), NHWC — the layout ConvNeXt was designed for."""
from __future__ import annotations

import jax.numpy as jnp

from ... import nn
from ...core import init as I
from ...core.module import Module, Param

__all__ = ["ConvNeXt", "convnext_tiny", "convnext_small", "convnext_base",
           "convnext_large"]


class ConvNeXtBlock(Module):
    def __init__(self, dim, drop_path=0.0, layer_scale=1e-6):
        self.dwconv = nn.Conv2d(dim, dim, 7, padding=3, groups=dim)
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.pwconv1 = nn.Linear(dim, 4 * dim)
        self.pwconv2 = nn.Linear(4 * dim, dim)
        self.gamma = Param(I.constant((dim,), layer_scale)) if layer_scale > 0 else None
        self.drop_path = nn.DropPath(drop_path)

    def __call__(self, x):
        y = self.dwconv(x)
        y = self.norm(y)
        y = self.pwconv2(nn.gelu(self.pwconv1(y)))
        if self.gamma is not None:
            y = y * self.gamma.value.astype(y.dtype)
        return x + self.drop_path(y)


class ConvNeXt(Module):
    def __init__(self, in_chans=3, num_classes=1000,
                 depths=(3, 3, 9, 3), dims=(96, 192, 384, 768),
                 drop_path_rate=0.0):
        self.downsample = [nn.Sequential(
            nn.Conv2d(in_chans, dims[0], 4, stride=4),
            nn.LayerNorm(dims[0], eps=1e-6))]
        for i in range(3):
            self.downsample.append(nn.Sequential(
                nn.LayerNorm(dims[i], eps=1e-6),
                nn.Conv2d(dims[i], dims[i + 1], 2, stride=2)))
        import numpy as np

        dpr = np.linspace(0, drop_path_rate, sum(depths)).tolist()
        self.stages = []
        di = 0
        for i, depth in enumerate(depths):
            self.stages.append([ConvNeXtBlock(dims[i], dpr[di + j])
                                for j in range(depth)])
            di += depth
        self.norm = nn.LayerNorm(dims[-1], eps=1e-6)
        self.head = nn.Linear(dims[-1], num_classes)

    def __call__(self, x):
        for down, blocks in zip(self.downsample, self.stages):
            x = down(x)
            for blk in blocks:
                x = blk(x)
        x = self.norm(jnp.mean(x, axis=(1, 2)))
        return self.head(x)


def convnext_tiny(pretrained=False, **kw):
    return ConvNeXt(depths=(3, 3, 9, 3), dims=(96, 192, 384, 768), **kw)


def convnext_small(pretrained=False, **kw):
    return ConvNeXt(depths=(3, 3, 27, 3), dims=(96, 192, 384, 768), **kw)


def convnext_base(pretrained=False, **kw):
    return ConvNeXt(depths=(3, 3, 27, 3), dims=(128, 256, 512, 1024), **kw)


def convnext_large(pretrained=False, **kw):
    return ConvNeXt(depths=(3, 3, 27, 3), dims=(192, 384, 768, 1536), **kw)
