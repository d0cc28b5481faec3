"""PeleeNet and HarDNet (reference tlxcv/models/classification/
{peleenet.py, hardnet.py}, paddle2tlx-converted), NHWC."""
from __future__ import annotations

import jax.numpy as jnp

from ... import nn

__all__ = ["PeleeNet", "peleenet", "HarDNet", "hardnet68",
           "hardnet85", "hardnet39", "CombConv"]


class ConvBNReLU(nn.Module):
    def __init__(self, cin, cout, k=3, stride=1, act=True):
        self.conv = nn.Conv2d(cin, cout, k, stride=stride, padding=k // 2,
                              bias=False)
        self.bn = nn.BatchNorm(cout)
        self.act = act

    def __call__(self, x):
        x = self.bn(self.conv(x))
        return nn.relu(x) if self.act else x


class CombConv(nn.Module):
    """Depthwise-separable layer of the HarDNet *_ds variants:
    1x1 pointwise + 3x3 depthwise."""

    def __init__(self, cin, cout, k=3, stride=1):
        self.pw = ConvBNReLU(cin, cout, 1)
        self.dw = nn.Conv2d(cout, cout, k, stride=stride, padding=k // 2,
                            groups=cout, bias=False)
        self.dw_bn = nn.BatchNorm(cout)

    def __call__(self, x):
        return self.dw_bn(self.dw(self.pw(x)))


class StemBlock(nn.Module):
    def __init__(self, out=32):
        self.c1 = ConvBNReLU(3, out, 3, 2)
        self.left = nn.Sequential(ConvBNReLU(out, out // 2, 1),
                                  ConvBNReLU(out // 2, out, 3, 2))
        self.right = nn.MaxPool2d(2, 2)
        self.fuse = ConvBNReLU(out * 2, out, 1)

    def __call__(self, x):
        x = self.c1(x)
        return self.fuse(jnp.concatenate([self.left(x), self.right(x)], -1))


class TwoWayDense(nn.Module):
    def __init__(self, cin, growth, bottleneck_width):
        mid = growth * bottleneck_width // 2
        self.a = nn.Sequential(ConvBNReLU(cin, mid, 1),
                               ConvBNReLU(mid, growth // 2, 3))
        self.b = nn.Sequential(ConvBNReLU(cin, mid, 1),
                               ConvBNReLU(mid, growth // 2, 3),
                               ConvBNReLU(growth // 2, growth // 2, 3))

    def __call__(self, x):
        return jnp.concatenate([x, self.a(x), self.b(x)], -1)


class PeleeNet(nn.Module):
    def __init__(self, num_classes=1000, growth=32,
                 block_cfg=(3, 4, 8, 6), bw=(1, 2, 4, 4)):
        self.stem = StemBlock(32)
        blocks = []
        cin = 32
        for si, (n, w) in enumerate(zip(block_cfg, bw)):
            for _ in range(n):
                blocks.append(TwoWayDense(cin, growth, w))
                cin += growth
            blocks.append(ConvBNReLU(cin, cin, 1))
            if si < len(block_cfg) - 1:
                blocks.append(nn.AvgPool2d(2, 2))
        self.blocks = blocks
        self.pool = nn.GlobalAvgPool2d()
        self.drop = nn.Dropout(0.05)
        self.fc = nn.Linear(cin, num_classes)

    def __call__(self, x):
        x = self.stem(x)
        for b in self.blocks:
            x = b(x)
        return self.fc(self.drop(self.pool(x)))


def peleenet(pretrained=False, **kw):
    return PeleeNet(**kw)


class HarDBlock(nn.Module):
    """Harmonic dense block: layer k links back 2^j steps."""

    def __init__(self, cin, growth, grmul, n_layers, depthwise=False):
        self.links = []
        layers = []
        self.out_channels = 0
        chs = [cin]
        for i in range(1, n_layers + 1):
            # largest power of two dividing i sets growth scaling and links
            j = 0
            while i % (2 ** (j + 1)) == 0:
                j += 1
            ch = int(int(growth * (grmul ** j) / 2) * 2)
            links = sorted({i - 2 ** p for p in range(j + 1)
                            if i - 2 ** p >= 0})
            cin_i = sum(chs[l] for l in links)
            layers.append((CombConv if depthwise else ConvBNReLU)(cin_i, ch, 3))
            self.links.append(links)
            chs.append(ch)
            if i == n_layers or i % 2 == 1:
                self.out_channels += ch
        self.layers = layers
        self.n_layers = n_layers

    def __call__(self, x):
        feats = [x]
        for i, (layer, links) in enumerate(zip(self.layers, self.links), 1):
            inp = jnp.concatenate([feats[l] for l in links], -1) \
                if len(links) > 1 else feats[links[0]]
            feats.append(layer(inp))
        outs = [feats[i] for i in range(1, self.n_layers + 1)
                if i == self.n_layers or i % 2 == 1]
        return jnp.concatenate(outs, -1)


class HarDNet(nn.Module):
    def __init__(self, num_classes=1000, first_ch=(32, 64),
                 ch_list=(128, 256, 320, 640), gr=(14, 16, 20, 40),
                 n_layers=(8, 16, 16, 16), downsample=(1, 0, 1, 1),
                 grmul=1.7, depthwise=False, drop=0.1):
        # defaults are the hardnet68 config
        if depthwise:
            self.stem = nn.Sequential(
                ConvBNReLU(3, first_ch[0], 3, 2),
                CombConv(first_ch[0], first_ch[1], 3, stride=2))
        else:
            self.stem = nn.Sequential(
                ConvBNReLU(3, first_ch[0], 3, 2),
                ConvBNReLU(first_ch[0], first_ch[1], 3),
                nn.MaxPool2d(3, 2, 1))
        blocks = []
        cin = first_ch[1]
        for i in range(len(ch_list)):
            blk = HarDBlock(cin, gr[i], grmul, n_layers[i],
                            depthwise=depthwise)
            blocks.append(blk)
            cin = blk.out_channels
            blocks.append(ConvBNReLU(cin, ch_list[i], 1))
            cin = ch_list[i]
            if downsample[i]:
                blocks.append(CombConv(cin, cin, 3, stride=2) if depthwise
                              else nn.MaxPool2d(2, 2))
        self.blocks = blocks
        self.pool = nn.GlobalAvgPool2d()
        self.drop = nn.Dropout(drop)
        self.fc = nn.Linear(cin, num_classes)

    def __call__(self, x):
        x = self.stem(x)
        for b in self.blocks:
            x = b(x)
        return self.fc(self.drop(self.pool(x)))


def hardnet68(pretrained=False, **kw):
    return HarDNet(**kw)


def hardnet85(pretrained=False, **kw):
    # reference README.md:63 hardnet85 (5 stages, drop 0.2)
    return HarDNet(first_ch=(48, 96), ch_list=(192, 256, 320, 480, 720),
                   gr=(24, 24, 28, 36, 48), n_layers=(8, 16, 16, 16, 16),
                   downsample=(1, 0, 1, 0, 1), grmul=1.7, drop=0.2, **kw)


def hardnet39(pretrained=False, **kw):
    # reference README.md:62 hardnet39 (depthwise-separable variant)
    return HarDNet(first_ch=(24, 48), ch_list=(96, 320, 640),
                   gr=(16, 20, 64), n_layers=(4, 16, 8),
                   downsample=(1, 1, 0), grmul=1.6, depthwise=True,
                   drop=0.05, **kw)
