"""VAN — Visual Attention Network (reference
tlxcv/models/classification/van.py, paddle2tlx-converted), NHWC."""
from __future__ import annotations

import jax.numpy as jnp

from ... import nn
from ...core import init as I
from ...core.module import Param

__all__ = ["VAN", "van_b0", "van_b1"]


class LKA(nn.Module):
    """Large-kernel attention: DW5 + DW-dilated7(d=3) + PW."""

    def __init__(self, dim):
        self.dw = nn.Conv2d(dim, dim, 5, padding=2, groups=dim)
        self.dwd = nn.Conv2d(dim, dim, 7, padding=9, dilation=3, groups=dim)
        self.pw = nn.Conv2d(dim, dim, 1)

    def __call__(self, x):
        return x * self.pw(self.dwd(self.dw(x)))


class Attention(nn.Module):
    def __init__(self, dim):
        self.proj1 = nn.Conv2d(dim, dim, 1)
        self.lka = LKA(dim)
        self.proj2 = nn.Conv2d(dim, dim, 1)

    def __call__(self, x):
        return self.proj2(self.lka(nn.gelu(self.proj1(x))))


class MLP(nn.Module):
    def __init__(self, dim, ratio=4):
        hidden = dim * ratio
        self.fc1 = nn.Conv2d(dim, hidden, 1)
        self.dw = nn.Conv2d(hidden, hidden, 3, padding=1, groups=hidden)
        self.fc2 = nn.Conv2d(hidden, dim, 1)

    def __call__(self, x):
        return self.fc2(nn.gelu(self.dw(self.fc1(x))))


class Block(nn.Module):
    def __init__(self, dim, mlp_ratio=4, ls_init=1e-2):
        self.norm1 = nn.BatchNorm(dim)
        self.attn = Attention(dim)
        self.norm2 = nn.BatchNorm(dim)
        self.mlp = MLP(dim, mlp_ratio)
        self.ls1 = Param(I.constant((dim,), ls_init))
        self.ls2 = Param(I.constant((dim,), ls_init))

    def __call__(self, x):
        x = x + self.ls1.value * self.attn(self.norm1(x))
        return x + self.ls2.value * self.mlp(self.norm2(x))


class VAN(nn.Module):
    def __init__(self, dims=(32, 64, 160, 256), depths=(3, 3, 5, 2),
                 num_classes=1000):
        self.patch_embeds = []
        self.stages = []
        self.norms = []
        cin = 3
        for i, (dim, depth) in enumerate(zip(dims, depths)):
            k, s = (7, 4) if i == 0 else (3, 2)
            self.patch_embeds.append(nn.Sequential(
                nn.Conv2d(cin, dim, k, stride=s, padding=k // 2),
                nn.BatchNorm(dim)))
            self.stages.append([Block(dim) for _ in range(depth)])
            self.norms.append(nn.LayerNorm(dim))
            cin = dim
        self.head = nn.Linear(dims[-1], num_classes)

    def __call__(self, x):
        for embed, blocks, norm in zip(self.patch_embeds, self.stages,
                                       self.norms):
            x = embed(x)
            for blk in blocks:
                x = blk(x)
            x = norm(x)
        return self.head(jnp.mean(x, axis=(1, 2)))


def van_b0(pretrained=False, **kw):
    return VAN(dims=(32, 64, 160, 256), depths=(3, 3, 5, 2), **kw)


def van_b1(pretrained=False, **kw):
    return VAN(dims=(64, 128, 320, 512), depths=(2, 2, 4, 2), **kw)
