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
import numpy as np

from ... import nn
from ...ops.image import interpolate

__all__ = ["HRNet", "hrnet_w18_small_v1", "hrnet_w18_small_v2", "hrnet_w18",
           "hrnet_w30", "hrnet_w32", "hrnet_w40", "hrnet_w44", "hrnet_w48",
           "hrnet_w60", "hrnet_w64", "SpaceToDepthBranch",
           "convert_hrnet_branches_to_s2d"]


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


class SpaceToDepthBranch(nn.Module):
    """Eval-exact blocked twin of a narrow-channel :class:`Branch`.

    Runs the branch's stride-1 BasicBlocks in a (ph, pw) space-to-depth
    layout — 3x3 kernels remapped via ``ops.remap_conv3x3_s1`` (exact),
    BatchNorm affine/stats channel-tiled (exact in eval mode), residual
    add/ReLU unchanged.  Channels widen ph*pw x toward the MXU's
    128-lane tile while spatial shrinks, cutting padded MXU passes on
    the 18/36-channel branches behind HRNet-W18's 13 TF/s layout-bound
    verdict (BENCHMARKS.md r3; probe_hrnet_s2d.py for the silicon A/B).

    Serving-only: blocked batch-stats would be computed per blocked
    channel, so calling under ``training=True`` raises.  Input H, W must
    be multiples of ph, pw.
    """

    def __init__(self, branch: "Branch", ph: int, pw: int):
        from ...ops.space_to_depth import remap_conv3x3_s1

        self.ph, self.pw = ph, pw
        p = ph * pw

        def blocked_cbr(cbr):
            w = cbr.conv.weight.value
            if w.shape[:2] != (3, 3) or tuple(cbr.conv.stride) != (1, 1):
                raise ValueError("branch blocks must be stride-1 3x3")
            cin, cout = w.shape[2], w.shape[3]
            wb = remap_conv3x3_s1(np.asarray(w), ph, pw)
            new = ConvBNReLU.__new__(ConvBNReLU)
            # w_init from the remapped kernel directly — the default
            # kaiming init would draw from core.init's global host RNG
            # (same reproducibility discipline as SpaceToDepthStem)
            new.conv = nn.Conv2d(p * cin, p * cout, 3, stride=1, padding=1,
                                 bias=False,
                                 w_init=lambda s, wb=wb: jnp.asarray(wb))
            new.bn = nn.BatchNorm(p * cout)
            for name in ("weight", "bias", "running_mean", "running_var"):
                var = getattr(cbr.bn, name)
                if var is not None:
                    getattr(new.bn, name).value = jnp.tile(var.value, p)
            new.bn.eps = cbr.bn.eps
            new.bn.momentum = cbr.bn.momentum
            new.act = cbr.act
            return new

        blocks = []
        for blk in branch.blocks:
            if blk.downsample is not None:
                raise ValueError("downsample blocks cannot be blocked")
            nb = BasicBlock.__new__(BasicBlock)
            nb.conv1 = blocked_cbr(blk.conv1)
            nb.conv2 = blocked_cbr(blk.conv2)
            nb.downsample = None
            blocks.append(nb)
        self.blocks = blocks

    def __call__(self, x):
        from ...core.module import is_training
        from ...ops.space_to_depth import (block_space_to_depth,
                                           unblock_space_to_depth)

        if is_training():
            raise RuntimeError(
                "SpaceToDepthBranch is a serving transform; blocked "
                "batch-stats differ — rebuild the model for training")
        b, h, w, c = x.shape
        if h % self.ph or w % self.pw:
            raise ValueError(f"H={h}, W={w} not divisible by "
                             f"({self.ph}, {self.pw})")
        z = block_space_to_depth(x, self.ph, self.pw)
        for blk in self.blocks:
            z = blk(z)
        return unblock_space_to_depth(z, self.ph, self.pw, c)


def convert_hrnet_branches_to_s2d(model, max_lanes=128):
    """Swap every narrow-channel HRNet :class:`Branch` for its exact
    :class:`SpaceToDepthBranch` twin (eval/serving only).

    Pack choice per branch of width c: (2, 2) if 4c <= max_lanes, else
    (2, 1) if 2c <= max_lanes, else unchanged — e.g. W18's 18-channel
    branch runs 2x2-blocked at 72 channels, the 36-channel branch
    2x1-blocked at 72, the 72/144-channel branches stay.  Returns the
    number of branches converted.  Apply BEFORE
    ``ops.quant.quantize_for_serving`` (forward-exact, calibration sees
    identical activations).
    """
    n = 0
    for _, m in model.modules():
        if not isinstance(m, HighResolutionModule):
            continue
        for i, br in enumerate(m.branches):
            if not isinstance(br, Branch):
                continue
            if any(b.downsample is not None for b in br.blocks):
                continue
            c = int(br.blocks[0].conv2.conv.weight.value.shape[3])
            if 4 * c <= max_lanes:
                ph, pw = 2, 2
            elif 2 * c <= max_lanes:
                ph, pw = 2, 1
            else:
                continue
            m.branches[i] = SpaceToDepthBranch(br, ph, pw)
            n += 1
    return n


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
