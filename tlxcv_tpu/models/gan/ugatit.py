"""U-GAT-IT generator (reference tlxcv/models/gan/models/
{generators/resnet_ugatit.py:219, discriminator_ugatit.py, ugatit_model.py}):
CAM attention + AdaILN decoder, NHWC."""
from __future__ import annotations

import jax.numpy as jnp

from ... import nn
from ...core import init as I
from ...core.module import Module, Param
from ...ops.image import interpolate, pad2d
from .registry import DISCRIMINATORS, GENERATORS

__all__ = ["UGATITGenerator", "UGATITDiscriminator"]


class ILN(Module):
    """Instance-Layer norm mix with learned rho."""

    def __init__(self, ch):
        self.rho = Param(I.zeros((ch,)))
        self.gamma = Param(I.ones((ch,)))
        self.beta = Param(I.zeros((ch,)))

    def __call__(self, x):
        inorm = (x - x.mean((1, 2), keepdims=True)) / jnp.sqrt(
            x.var((1, 2), keepdims=True) + 1e-5)
        lnorm = (x - x.mean((1, 2, 3), keepdims=True)) / jnp.sqrt(
            x.var((1, 2, 3), keepdims=True) + 1e-5)
        rho = jnp.clip(self.rho.value, 0, 1)
        return (rho * inorm + (1 - rho) * lnorm) * self.gamma.value + \
            self.beta.value


class AdaILN(Module):
    def __init__(self, ch):
        self.rho = Param(I.constant((ch,), 0.9))

    def __call__(self, x, gamma, beta):
        inorm = (x - x.mean((1, 2), keepdims=True)) / jnp.sqrt(
            x.var((1, 2), keepdims=True) + 1e-5)
        lnorm = (x - x.mean((1, 2, 3), keepdims=True)) / jnp.sqrt(
            x.var((1, 2, 3), keepdims=True) + 1e-5)
        rho = jnp.clip(self.rho.value, 0, 1)
        out = rho * inorm + (1 - rho) * lnorm
        return out * gamma[:, None, None, :] + beta[:, None, None, :]


class ResnetBlock(Module):
    """Encoder bottleneck: reflect-pad conv-IN-relu, reflect-pad conv-IN,
    residual (reference resnet_ugatit.py ResnetBlock :117-139 — two
    convs, restored vs the earlier single-conv sketch)."""

    def __init__(self, dim):
        self.conv1 = nn.Conv2d(dim, dim, 3, bias=False)
        self.norm1 = nn.InstanceNorm(dim)
        self.conv2 = nn.Conv2d(dim, dim, 3, bias=False)
        self.norm2 = nn.InstanceNorm(dim)

    def __call__(self, x):
        y = pad2d(x, (1, 1, 1, 1), "reflect")
        y = nn.relu(self.norm1(self.conv1(y)))
        y = pad2d(y, (1, 1, 1, 1), "reflect")
        y = self.norm2(self.conv2(y))
        return x + y


class ResnetAdaILNBlock(Module):
    def __init__(self, dim):
        self.conv1 = nn.Conv2d(dim, dim, 3, bias=False)
        self.norm1 = AdaILN(dim)
        self.conv2 = nn.Conv2d(dim, dim, 3, bias=False)
        self.norm2 = AdaILN(dim)

    def __call__(self, x, gamma, beta):
        y = pad2d(x, (1, 1, 1, 1), "reflect")
        y = nn.relu(self.norm1(self.conv1(y), gamma, beta))
        y = pad2d(y, (1, 1, 1, 1), "reflect")
        y = self.norm2(self.conv2(y), gamma, beta)
        return x + y


@GENERATORS.register
class UGATITGenerator(Module):
    """(reference resnet_ugatit.py:12-116, faithful topology: reflect
    padding throughout, two-conv encoder ResnetBlocks, bias-free
    FC/gamma/beta, and the (out, cam_logit, heatmap) return)."""

    def __init__(self, input_nc=3, output_nc=3, ngf=32, n_blocks=4,
                 img_size=64, light=True):
        self.light = light
        self.stem = nn.Sequential(
            nn.Conv2d(input_nc, ngf, 7, bias=False), nn.InstanceNorm(ngf),
            nn.Activation("relu"))
        self.down1 = nn.Sequential(
            nn.Conv2d(ngf, ngf * 2, 3, stride=2, bias=False),
            nn.InstanceNorm(ngf * 2), nn.Activation("relu"))
        self.down2 = nn.Sequential(
            nn.Conv2d(ngf * 2, ngf * 4, 3, stride=2, bias=False),
            nn.InstanceNorm(ngf * 4), nn.Activation("relu"))
        d = ngf * 4
        self.enc_blocks = [ResnetBlock(d) for _ in range(n_blocks)]
        # CAM
        self.gap_fc = nn.Linear(d, 1, bias=False)
        self.gmp_fc = nn.Linear(d, 1, bias=False)
        self.conv1x1 = nn.Conv2d(d * 2, d, 1)
        # style (gamma/beta) from attention features; light=True pools
        # first (reference :51-63); all style linears are bias-free
        fc_in = d if light else (img_size // 4) ** 2 * d
        self.fc = nn.Sequential(
            nn.Linear(fc_in, d, bias=False), nn.Activation("relu"),
            nn.Linear(d, d, bias=False), nn.Activation("relu"))
        self.gamma = nn.Linear(d, d, bias=False)
        self.beta = nn.Linear(d, d, bias=False)
        self.dec_blocks = [ResnetAdaILNBlock(d) for _ in range(n_blocks)]
        self.up1_conv = nn.Conv2d(d, ngf * 2, 3, bias=False)
        self.up1_norm = ILN(ngf * 2)
        self.up2_conv = nn.Conv2d(ngf * 2, ngf, 3, bias=False)
        self.up2_norm = ILN(ngf)
        self.head = nn.Conv2d(ngf, output_nc, 7, bias=False)

    def __call__(self, x):
        x = pad2d(x, (3, 3, 3, 3), "reflect")
        x = self.stem(x)
        x = self.down1(pad2d(x, (1, 1, 1, 1), "reflect"))
        x = self.down2(pad2d(x, (1, 1, 1, 1), "reflect"))
        for blk in self.enc_blocks:
            x = blk(x)
        # CAM attention: gap + gmp logits reweight channels
        gap = x.mean((1, 2))
        gmp = x.max((1, 2))
        gap_logit = self.gap_fc(gap)
        gmp_logit = self.gmp_fc(gmp)
        gap_w = self.gap_fc.weight.value[:, 0]
        gmp_w = self.gmp_fc.weight.value[:, 0]
        x = jnp.concatenate([x * gap_w, x * gmp_w], -1)
        x = nn.relu(self.conv1x1(x))
        cam_logit = jnp.concatenate([gap_logit, gmp_logit], -1)
        heatmap = jnp.sum(x, axis=-1, keepdims=True)

        style_in = x.mean((1, 2)) if self.light \
            else x.reshape(x.shape[0], -1)
        style = self.fc(style_in)
        gamma, beta = self.gamma(style), self.beta(style)
        for blk in self.dec_blocks:
            x = blk(x, gamma, beta)
        x = interpolate(x, scale_factor=2, mode="nearest")
        x = nn.relu(self.up1_norm(self.up1_conv(
            pad2d(x, (1, 1, 1, 1), "reflect"))))
        x = interpolate(x, scale_factor=2, mode="nearest")
        x = nn.relu(self.up2_norm(self.up2_conv(
            pad2d(x, (1, 1, 1, 1), "reflect"))))
        x = pad2d(x, (3, 3, 3, 3), "reflect")
        return nn.tanh(self.head(x)), cam_logit, heatmap


@DISCRIMINATORS.register
class UGATITDiscriminator(Module):
    """(reference discriminator_ugatit.py:10-73, faithful: reflect-pad
    4x4 convs WITH InstanceNorm, CAM gap/gmp reweighting, bias-free
    final conv, (out, cam_logit, heatmap) return)."""

    def __init__(self, input_nc=3, ndf=32, n_layers=5):
        convs, norms = [], []
        cin, d = input_nc, ndf
        convs.append(nn.Conv2d(cin, d, 4, stride=2))
        norms.append(nn.InstanceNorm(d))
        for _ in range(n_layers - 3):
            convs.append(nn.Conv2d(d, d * 2, 4, stride=2))
            norms.append(nn.InstanceNorm(d * 2))
            d *= 2
        convs.append(nn.Conv2d(d, d * 2, 4, stride=1))
        norms.append(nn.InstanceNorm(d * 2))
        d *= 2
        self.convs = convs
        self.norms = norms
        self.gap_fc = nn.Linear(d, 1, bias=False)
        self.gmp_fc = nn.Linear(d, 1, bias=False)
        self.conv1x1 = nn.Conv2d(d * 2, d, 1)
        self.head = nn.Conv2d(d, 1, 4, stride=1, bias=False)

    def __call__(self, x):
        for conv, norm in zip(self.convs, self.norms):
            x = pad2d(x, (1, 1, 1, 1), "reflect")
            x = nn.leaky_relu(norm(conv(x)), 0.2)
        gap_logit = self.gap_fc(x.mean((1, 2)))
        gmp_logit = self.gmp_fc(x.max((1, 2)))
        x = jnp.concatenate([x * self.gap_fc.weight.value[:, 0],
                             x * self.gmp_fc.weight.value[:, 0]], -1)
        x = nn.leaky_relu(self.conv1x1(x), 0.2)
        cam_logit = jnp.concatenate([gap_logit, gmp_logit], -1)
        heatmap = jnp.sum(x, axis=-1, keepdims=True)
        out = self.head(pad2d(x, (1, 1, 1, 1), "reflect"))
        return out, cam_logit, heatmap
