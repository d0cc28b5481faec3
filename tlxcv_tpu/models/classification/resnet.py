"""ResNet / wide-ResNet / ResNeXt family, TPU-native NHWC.

Same architecture space as the reference's hand-written TLX ResNet
(reference tlxcv/models/classification/resnet.py — BasicBlock :16,
BottleneckBlock :80, ResNet :303, factories :319-...), re-designed for
XLA: single layout, jit-friendly, bf16-ready.  torchvision-compatible
weight topology so converted pretrained weights map 1:1.
"""
from __future__ import annotations

from ... import nn
from ...core import init as I

__all__ = [
    "ResNet", "resnet18", "resnet34", "resnet50", "resnet101", "resnet152",
    "wide_resnet50_2", "wide_resnet101_2", "resnext50_32x4d",
    "resnext101_32x4d", "resnext101_64x4d",
]


def conv3x3(cin, cout, stride=1, groups=1, dilation=1):
    return nn.Conv2d(cin, cout, 3, stride=stride, padding=dilation,
                     dilation=dilation, groups=groups, bias=False)


def conv1x1(cin, cout, stride=1):
    return nn.Conv2d(cin, cout, 1, stride=stride, bias=False)


class BasicBlock(nn.Module):
    expansion = 1

    def __init__(self, in_channels, out_channels, stride=1, downsample=None,
                 groups=1, base_width=64, dilation=1):
        if dilation > 1:
            raise NotImplementedError("Dilation > 1 not supported in BasicBlock")
        self.conv1 = conv3x3(in_channels, out_channels, stride)
        self.bn1 = nn.BatchNorm(out_channels)
        self.conv2 = conv3x3(out_channels, out_channels)
        self.bn2 = nn.BatchNorm(out_channels)
        self.downsample = downsample

    def __call__(self, x):
        identity = x if self.downsample is None else self.downsample(x)
        out = nn.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return nn.relu(out + identity)


class BottleneckBlock(nn.Module):
    expansion = 4

    def __init__(self, in_channels, out_channels, stride=1, downsample=None,
                 groups=1, base_width=64, dilation=1):
        width = int(out_channels * (base_width / 64.0)) * groups
        self.conv1 = conv1x1(in_channels, width)
        self.bn1 = nn.BatchNorm(width)
        self.conv2 = conv3x3(width, width, stride, groups, dilation)
        self.bn2 = nn.BatchNorm(width)
        self.conv3 = conv1x1(width, out_channels * self.expansion)
        self.bn3 = nn.BatchNorm(out_channels * self.expansion)
        self.downsample = downsample

    def __call__(self, x):
        identity = x if self.downsample is None else self.downsample(x)
        out = nn.relu(self.bn1(self.conv1(x)))
        out = nn.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return nn.relu(out + identity)


_DEPTH_CFG = {
    18: (BasicBlock, (2, 2, 2, 2)),
    34: (BasicBlock, (3, 4, 6, 3)),
    50: (BottleneckBlock, (3, 4, 6, 3)),
    101: (BottleneckBlock, (3, 4, 23, 3)),
    152: (BottleneckBlock, (3, 8, 36, 3)),
}


class ResNet(nn.Module):
    """Returns logits [N, num_classes]; `features()` returns the C2-C5
    pyramid for detection/segmentation necks."""

    def __init__(self, block=None, depth=50, width=64, num_classes=1000,
                 with_pool=True, groups=1, strides=(2, 1, 2, 2, 2),
                 in_channels=3):
        """``strides`` = (conv1, layer1..layer4) — the RS change-detection
        backbones vary these (reference rs/cd/models/stanet.py Backbone
        strides=(2,1,2,2,2), dsamnet.py (1,1,2,2,1))."""
        if block is None:
            block, layer_counts = _DEPTH_CFG[depth]
        else:
            layer_counts = _DEPTH_CFG[depth][1]
        self.num_classes = num_classes
        self.with_pool = with_pool
        self.groups = groups
        self.base_width = width

        self.conv1 = nn.Conv2d(in_channels, 64, 7, stride=strides[0],
                               padding=3, bias=False)
        self.bn1 = nn.BatchNorm(64)
        self.maxpool = nn.MaxPool2d(3, 2, 1)

        self.inplanes = 64
        self.layer1 = self._make_layer(block, 64, layer_counts[0], strides[1])
        self.layer2 = self._make_layer(block, 128, layer_counts[1], strides[2])
        self.layer3 = self._make_layer(block, 256, layer_counts[2], strides[3])
        self.layer4 = self._make_layer(block, 512, layer_counts[3], strides[4])
        self.feat_channels = [c * block.expansion for c in (64, 128, 256, 512)]

        if with_pool:
            self.avgpool = nn.GlobalAvgPool2d()
        if num_classes > 0:
            self.fc = nn.Linear(512 * block.expansion, num_classes,
                                w_init=lambda s: I.normal(s, std=0.01))

    def _make_layer(self, block, planes, blocks, stride):
        downsample = None
        if stride != 1 or self.inplanes != planes * block.expansion:
            downsample = nn.Sequential(
                conv1x1(self.inplanes, planes * block.expansion, stride),
                nn.BatchNorm(planes * block.expansion),
            )
        layers = [block(self.inplanes, planes, stride, downsample,
                        self.groups, self.base_width)]
        self.inplanes = planes * block.expansion
        for _ in range(1, blocks):
            layers.append(block(self.inplanes, planes, groups=self.groups,
                                base_width=self.base_width))
        return nn.Sequential(*layers)

    def stem(self, x):
        return self.maxpool(nn.relu(self.bn1(self.conv1(x))))

    def features(self, x):
        """C2..C5 feature pyramid (NHWC)."""
        x = self.stem(x)
        c2 = self.layer1(x)
        c3 = self.layer2(c2)
        c4 = self.layer3(c3)
        c5 = self.layer4(c4)
        return [c2, c3, c4, c5]

    def __call__(self, x):
        x = self.features(x)[-1]
        if self.with_pool:
            x = self.avgpool(x)
        if self.num_classes > 0:
            x = self.fc(x)
        return x


def _resnet(depth, **kwargs):
    return ResNet(depth=depth, **kwargs)


def resnet18(pretrained=False, **kwargs):
    return _resnet(18, **kwargs)


def resnet34(pretrained=False, **kwargs):
    return _resnet(34, **kwargs)


def resnet50(pretrained=False, **kwargs):
    return _resnet(50, **kwargs)


def resnet101(pretrained=False, **kwargs):
    return _resnet(101, **kwargs)


def resnet152(pretrained=False, **kwargs):
    return _resnet(152, **kwargs)


def wide_resnet50_2(pretrained=False, **kwargs):
    return _resnet(50, width=128, **kwargs)


def wide_resnet101_2(pretrained=False, **kwargs):
    return _resnet(101, width=128, **kwargs)


def resnext50_32x4d(pretrained=False, **kwargs):
    return _resnet(50, groups=32, width=4, **kwargs)


def resnext101_32x4d(pretrained=False, **kwargs):
    return _resnet(101, groups=32, width=4, **kwargs)


def resnext101_64x4d(pretrained=False, **kwargs):
    return _resnet(101, groups=64, width=4, **kwargs)
