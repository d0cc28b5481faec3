"""HRNet family — one core shared by segmentation and pose
(reference keeps two copies: tlxcv/models/segmentation/backbones/hrnet.py
and tlxcv/models/human_pose_estimation/hrnet.py:436 PoseHighResolutionNet;
this single NHWC implementation serves both).

Multi-resolution parallel branches with repeated FuseLayers exchange
(reference hrnet.py:354-418); fusion upsampling uses bilinear resize —
the BASELINE config #4 Pallas-kernel slot (ops.interpolate boundary).
"""
from __future__ import annotations

import jax.numpy as jnp

from ... import nn
from ...ops.image import interpolate

__all__ = ["HRNet", "hrnet_w18_small_v1", "hrnet_w18_small_v2", "hrnet_w18",
           "hrnet_w30", "hrnet_w32", "hrnet_w40", "hrnet_w44", "hrnet_w48",
           "hrnet_w60", "hrnet_w64"]


class ConvBNReLU(nn.Module):
    def __init__(self, cin, cout, k, stride=1, act=True):
        self.conv = nn.Conv2d(cin, cout, k, stride=stride, padding=k // 2,
                              bias=False)
        self.bn = nn.BatchNorm(cout)
        self.act = act

    def __call__(self, x):
        x = self.bn(self.conv(x))
        return nn.relu(x) if self.act else x


class BasicBlock(nn.Module):
    expansion = 1

    def __init__(self, cin, cout, stride=1, downsample=False):
        self.conv1 = ConvBNReLU(cin, cout, 3, stride)
        self.conv2 = ConvBNReLU(cout, cout, 3, act=False)
        self.downsample = (ConvBNReLU(cin, cout, 1, stride, act=False)
                           if downsample else None)

    def __call__(self, x):
        identity = self.downsample(x) if self.downsample else x
        out = self.conv2(self.conv1(x))
        return nn.relu(out + identity)


class BottleneckBlock(nn.Module):
    expansion = 4

    def __init__(self, cin, planes, stride=1, downsample=False):
        self.conv1 = ConvBNReLU(cin, planes, 1)
        self.conv2 = ConvBNReLU(planes, planes, 3, stride)
        self.conv3 = ConvBNReLU(planes, planes * 4, 1, act=False)
        self.downsample = (ConvBNReLU(cin, planes * 4, 1, stride, act=False)
                           if downsample else None)

    def __call__(self, x):
        identity = self.downsample(x) if self.downsample else x
        out = self.conv3(self.conv2(self.conv1(x)))
        return nn.relu(out + identity)


class Branch(nn.Module):
    def __init__(self, cin, cout, num_blocks):
        blocks = [BasicBlock(cin, cout, downsample=cin != cout)]
        for _ in range(num_blocks - 1):
            blocks.append(BasicBlock(cout, cout))
        self.blocks = blocks

    def __call__(self, x):
        for b in self.blocks:
            x = b(x)
        return x


class FuseLayers(nn.Module):
    """Full cross-resolution fusion (reference hrnet.py:354-418)."""

    def __init__(self, channels):
        n = len(channels)
        self.n = n
        self.paths = {}
        for i in range(n):        # output branch
            for j in range(n):    # input branch
                if j > i:
                    # upsample path: 1x1 conv then resize
                    self.paths[f"{i}_{j}"] = ConvBNReLU(channels[j],
                                                        channels[i], 1,
                                                        act=False)
                elif j < i:
                    # downsample path: chain of stride-2 3x3 convs
                    convs = []
                    cin = channels[j]
                    for k in range(i - j):
                        last = k == i - j - 1
                        cout = channels[i] if last else channels[j]
                        convs.append(ConvBNReLU(cin, cout, 3, 2, act=not last))
                        cin = cout
                    self.paths[f"{i}_{j}"] = nn.Sequential(*convs)

    def __call__(self, xs):
        outs = []
        for i in range(self.n):
            acc = xs[i]
            for j in range(self.n):
                if j == i:
                    continue
                p = self.paths[f"{i}_{j}"](xs[j])
                if j > i:
                    p = interpolate(p, size=xs[i].shape[1:3], mode="bilinear")
                acc = acc + p
            outs.append(nn.relu(acc))
        return outs


class TransitionLayer(nn.Module):
    def __init__(self, in_channels, out_channels):
        self.convs = []
        for i, cout in enumerate(out_channels):
            if i < len(in_channels):
                self.convs.append(
                    ConvBNReLU(in_channels[i], cout, 3)
                    if in_channels[i] != cout else nn.Identity())
            else:
                self.convs.append(ConvBNReLU(in_channels[-1], cout, 3, 2))

    def __call__(self, xs):
        outs = []
        for i, conv in enumerate(self.convs):
            src = xs[i] if i < len(xs) else xs[-1]
            outs.append(conv(src) if not isinstance(conv, nn.Identity) else src)
        return outs


class HighResolutionModule(nn.Module):
    def __init__(self, channels, num_blocks):
        self.branches = [Branch(c, c, b) for c, b in zip(channels, num_blocks)]
        self.fuse = FuseLayers(channels)

    def __call__(self, xs):
        xs = [b(x) for b, x in zip(self.branches, xs)]
        return self.fuse(xs)


class Stage(nn.Module):
    def __init__(self, channels, num_modules, num_blocks):
        self.modules_ = [HighResolutionModule(channels, num_blocks)
                         for _ in range(num_modules)]

    def __call__(self, xs):
        for m in self.modules_:
            xs = m(xs)
        return xs


class HRNet(nn.Module):
    """Returns the list of 4 branch outputs; `concat_features()` gives
    the seg-style upsampled concat."""

    def __init__(self,
                 stage1_num_modules=1, stage1_num_blocks=(4,),
                 stage1_num_channels=(64,),
                 stage2_num_modules=1, stage2_num_blocks=(4, 4),
                 stage2_num_channels=(18, 36),
                 stage3_num_modules=4, stage3_num_blocks=(4, 4, 4),
                 stage3_num_channels=(18, 36, 72),
                 stage4_num_modules=3, stage4_num_blocks=(4, 4, 4, 4),
                 stage4_num_channels=(18, 36, 72, 144)):
        self.conv1 = ConvBNReLU(3, 64, 3, 2)
        self.conv2 = ConvBNReLU(64, 64, 3, 2)
        c1 = stage1_num_channels[0]
        layer1 = [BottleneckBlock(64, c1, downsample=True)]
        for _ in range(stage1_num_blocks[0] - 1):
            layer1.append(BottleneckBlock(c1 * 4, c1))
        self.layer1 = layer1
        self.tr1 = TransitionLayer([c1 * 4], stage2_num_channels)
        self.st2 = Stage(stage2_num_channels, stage2_num_modules,
                         stage2_num_blocks)
        self.tr2 = TransitionLayer(stage2_num_channels, stage3_num_channels)
        self.st3 = Stage(stage3_num_channels, stage3_num_modules,
                         stage3_num_blocks)
        self.tr3 = TransitionLayer(stage3_num_channels, stage4_num_channels)
        self.st4 = Stage(stage4_num_channels, stage4_num_modules,
                         stage4_num_blocks)
        self.feat_channels = [sum(stage4_num_channels)]
        self.branch_channels = list(stage4_num_channels)

    def __call__(self, x):
        x = self.conv2(self.conv1(x))
        for b in self.layer1:
            x = b(x)
        xs = self.tr1([x])
        xs = self.st2(xs)
        xs = self.tr2(xs)
        xs = self.st3(xs)
        xs = self.tr3(xs)
        xs = self.st4(xs)
        return xs

    def concat_features(self, x):
        xs = self(x)
        size = xs[0].shape[1:3]
        ups = [xs[0]] + [interpolate(b, size=size, mode="bilinear")
                         for b in xs[1:]]
        return jnp.concatenate(ups, axis=-1)


def _hrnet(w, small=None, **kw):
    if small == "v1":
        return HRNet(stage1_num_blocks=(1,), stage1_num_channels=(32,),
                     stage2_num_blocks=(2, 2), stage2_num_channels=(16, 32),
                     stage3_num_modules=1, stage3_num_blocks=(2, 2, 2),
                     stage3_num_channels=(16, 32, 64),
                     stage4_num_modules=1, stage4_num_blocks=(2, 2, 2, 2),
                     stage4_num_channels=(16, 32, 64, 128), **kw)
    if small == "v2":
        return HRNet(stage1_num_blocks=(2,),
                     stage2_num_blocks=(2, 2), stage2_num_channels=(18, 36),
                     stage3_num_modules=3, stage3_num_blocks=(2, 2, 2),
                     stage3_num_channels=(18, 36, 72),
                     stage4_num_modules=2, stage4_num_blocks=(2, 2, 2, 2),
                     stage4_num_channels=(18, 36, 72, 144), **kw)
    return HRNet(stage2_num_channels=(w, 2 * w),
                 stage3_num_channels=(w, 2 * w, 4 * w),
                 stage4_num_channels=(w, 2 * w, 4 * w, 8 * w), **kw)


def hrnet_w18_small_v1(**kw):
    return _hrnet(18, "v1", **kw)


def hrnet_w18_small_v2(**kw):
    return _hrnet(18, "v2", **kw)


def hrnet_w18(**kw):
    return _hrnet(18, **kw)


def hrnet_w30(**kw):
    return _hrnet(30, **kw)


def hrnet_w32(**kw):
    return _hrnet(32, **kw)


def hrnet_w40(**kw):
    return _hrnet(40, **kw)


def hrnet_w44(**kw):
    return _hrnet(44, **kw)


def hrnet_w48(**kw):
    return _hrnet(48, **kw)


def hrnet_w60(**kw):
    return _hrnet(60, **kw)


def hrnet_w64(**kw):
    return _hrnet(64, **kw)
