"""DarkNet-53 backbone (reference tlxcv/models/detection/backbones/darknet.py:
ConvBNLayer :7, DarkNet :220), NHWC."""
from __future__ import annotations

from .... import nn

__all__ = ["ConvBNLayer", "DarkNet", "darknet53"]


class ConvBNLayer(nn.Module):
    def __init__(self, ch_in, ch_out, filter_size=3, stride=1, padding=0,
                 groups=1, act="leaky"):
        self.conv = nn.Conv2d(ch_in, ch_out, filter_size, stride=stride,
                              padding=padding, groups=groups, bias=False)
        self.bn = nn.BatchNorm(ch_out)
        self.act = act

    def __call__(self, x):
        x = self.bn(self.conv(x))
        if self.act == "leaky":
            return nn.leaky_relu(x, 0.1)
        return nn.get_activation(self.act)(x)


class DownSample(nn.Module):
    def __init__(self, ch_in, ch_out):
        self.conv = ConvBNLayer(ch_in, ch_out, 3, stride=2, padding=1)

    def __call__(self, x):
        return self.conv(x)


class BasicBlock(nn.Module):
    def __init__(self, ch_in, ch_out):
        self.conv1 = ConvBNLayer(ch_in, ch_out, 1, padding=0)
        self.conv2 = ConvBNLayer(ch_out, ch_out * 2, 3, padding=1)

    def __call__(self, x):
        return x + self.conv2(self.conv1(x))


class Blocks(nn.Module):
    def __init__(self, ch_in, ch_out, count):
        self.blocks = [BasicBlock(ch_in if i == 0 else ch_out * 2, ch_out)
                       for i in range(count)]

    def __call__(self, x):
        for b in self.blocks:
            x = b(x)
        return x


class DarkNet(nn.Module):
    """Returns feature maps for return_idx (default C3, C4, C5)."""

    def __init__(self, depth=53, return_idx=(2, 3, 4)):
        assert depth == 53
        stages = (1, 2, 8, 8, 4)
        self.return_idx = tuple(return_idx)
        self.conv0 = ConvBNLayer(3, 32, 3, padding=1)
        self.downsample0 = DownSample(32, 64)
        self.stages = []
        self.downsamples = []
        ch_in = 64
        for i, count in enumerate(stages):
            out = 32 * (2 ** i)
            self.stages.append(Blocks(ch_in, out, count))
            ch_in = out * 2
            if i < len(stages) - 1:
                self.downsamples.append(DownSample(ch_in, ch_in * 2))
                ch_in = ch_in * 2
        self.out_channels = [64 * (2 ** i) for i in self.return_idx]

    def __call__(self, x):
        x = self.downsample0(self.conv0(x))
        outs = []
        for i, stage in enumerate(self.stages):
            x = stage(x)
            if i in self.return_idx:
                outs.append(x)
            if i < len(self.stages) - 1:
                x = self.downsamples[i](x)
        return outs


def darknet53(**kwargs):
    return DarkNet(depth=53, **kwargs)
