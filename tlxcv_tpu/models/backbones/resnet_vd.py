"""ResNet-vD backbone (deep stem + avg-pool downsample shortcuts, with
output_stride dilation for DeepLab) — reference
tlxcv/models/segmentation/backbones/resnet_vd.py, NHWC."""
from __future__ import annotations

from ... import nn

__all__ = ["ResNetVD", "resnet18_vd", "resnet34_vd", "resnet50_vd",
           "resnet101_vd", "resnet152_vd"]


class ConvBNReLU(nn.Module):
    def __init__(self, cin, cout, k, stride=1, dilation=1, act=True,
                 avg_first=False):
        self.avg = nn.AvgPool2d(2, 2, 0) if avg_first else None
        self.conv = nn.Conv2d(cin, cout, k, stride=1 if avg_first else stride,
                              padding=(k - 1) // 2 * dilation,
                              dilation=dilation, bias=False)
        self.bn = nn.BatchNorm(cout)
        self.act = act

    def __call__(self, x):
        if self.avg is not None:
            x = self.avg(x)
        x = self.bn(self.conv(x))
        return nn.relu(x) if self.act else x


class BottleneckVD(nn.Module):
    def __init__(self, cin, planes, stride=1, shortcut=True, if_first=False,
                 dilation=1):
        self.conv0 = ConvBNReLU(cin, planes, 1)
        self.conv1 = ConvBNReLU(planes, planes, 3, stride=stride,
                                dilation=dilation)
        self.conv2 = ConvBNReLU(planes, planes * 4, 1, act=False)
        self.shortcut = shortcut
        if not shortcut:
            self.short = ConvBNReLU(cin, planes * 4, 1, act=False,
                                    avg_first=not if_first and stride != 1)

    def __call__(self, x):
        out = self.conv2(self.conv1(self.conv0(x)))
        identity = x if self.shortcut else self.short(x)
        return nn.relu(out + identity)


class BasicBlockVD(nn.Module):
    def __init__(self, cin, planes, stride=1, shortcut=True, if_first=False,
                 dilation=1):
        self.conv0 = ConvBNReLU(cin, planes, 3, stride=stride,
                                dilation=dilation)
        self.conv1 = ConvBNReLU(planes, planes, 3, act=False)
        self.shortcut = shortcut
        if not shortcut:
            self.short = ConvBNReLU(cin, planes, 1, act=False,
                                    avg_first=not if_first and stride != 1)

    def __call__(self, x):
        out = self.conv1(self.conv0(x))
        identity = x if self.shortcut else self.short(x)
        return nn.relu(out + identity)


_DEPTHS = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3), 50: (3, 4, 6, 3),
           101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}


class ResNetVD(nn.Module):
    def __init__(self, layers=50, output_stride=8):
        depths = _DEPTHS[layers]
        bottleneck = layers >= 50
        block = BottleneckVD if bottleneck else BasicBlockVD
        exp = 4 if bottleneck else 1
        if output_stride == 8:
            dilations = (1, 1, 2, 4)
            strides = (1, 2, 1, 1)
        elif output_stride == 16:
            dilations = (1, 1, 1, 2)
            strides = (1, 2, 2, 1)
        else:
            dilations = (1, 1, 1, 1)
            strides = (1, 2, 2, 2)

        # vd deep stem: three 3x3 convs
        self.stem = nn.Sequential(
            ConvBNReLU(3, 32, 3, stride=2), ConvBNReLU(32, 32, 3),
            ConvBNReLU(32, 64, 3))
        self.maxpool = nn.MaxPool2d(3, 2, 1)

        planes = (64, 128, 256, 512)
        self.stages = []
        cin = 64
        for si, (n, p, s, d) in enumerate(zip(depths, planes, strides,
                                              dilations)):
            blocks = []
            for bi in range(n):
                stride = s if bi == 0 else 1
                # dilation trick: first block of a dilated stage uses d//2
                dd = max(d // 2, 1) if (d > 1 and bi == 0) else d
                blocks.append(block(cin, p, stride=stride,
                                    shortcut=bi != 0, if_first=si == 0,
                                    dilation=dd))
                cin = p * exp
            self.stages.append(blocks)
        self.feat_channels = [p * exp for p in planes]

    def __call__(self, x):
        x = self.maxpool(self.stem(x))
        feats = []
        for blocks in self.stages:
            for b in blocks:
                x = b(x)
            feats.append(x)
        return feats


def resnet18_vd(**kw):
    return ResNetVD(18, **kw)


def resnet34_vd(**kw):
    return ResNetVD(34, **kw)


def resnet50_vd(**kw):
    return ResNetVD(50, **kw)


def resnet101_vd(**kw):
    return ResNetVD(101, **kw)


def resnet152_vd(**kw):
    return ResNetVD(152, **kw)
