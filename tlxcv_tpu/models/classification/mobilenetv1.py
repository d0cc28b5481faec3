"""MobileNetV1 (reference tlxcv/models/classification/mobilenetv1.py and
detection/backbones/mobilenet_v1.py — also the SSD backbone), NHWC."""
from __future__ import annotations

from ... import nn

__all__ = ["MobileNetV1", "mobilenet_v1"]


class ConvBNReLU(nn.Module):
    def __init__(self, cin, cout, k, stride=1, padding=0, groups=1):
        self.conv = nn.Conv2d(cin, cout, k, stride=stride, padding=padding,
                              groups=groups, bias=False)
        self.bn = nn.BatchNorm(cout)

    def __call__(self, x):
        return nn.relu(self.bn(self.conv(x)))


class DepthwiseSeparable(nn.Module):
    def __init__(self, cin, cout, stride):
        self.dw = ConvBNReLU(cin, cin, 3, stride, 1, groups=cin)
        self.pw = ConvBNReLU(cin, cout, 1)

    def __call__(self, x):
        return self.pw(self.dw(x))


_CFG = [  # (out, stride)
    (64, 1), (128, 2), (128, 1), (256, 2), (256, 1), (512, 2),
    (512, 1), (512, 1), (512, 1), (512, 1), (512, 1),
    (1024, 2), (1024, 1),
]


class MobileNetV1(nn.Module):
    def __init__(self, num_classes=1000, scale=1.0, with_pool=True,
                 feature_idx=None):
        """feature_idx: indices of blocks whose outputs to return from
        `features()` (detection necks)."""
        s = lambda c: max(int(c * scale), 8)
        self.stem = ConvBNReLU(3, s(32), 3, 2, 1)
        blocks = []
        cin = s(32)
        for out, stride in _CFG:
            blocks.append(DepthwiseSeparable(cin, s(out), stride))
            cin = s(out)
        self.blocks = blocks
        self.out_channels = cin
        self.with_pool = with_pool
        self.num_classes = num_classes
        self.feature_idx = feature_idx
        if with_pool:
            self.pool = nn.GlobalAvgPool2d()
        if num_classes > 0:
            self.fc = nn.Linear(cin, num_classes)

    def features(self, x):
        x = self.stem(x)
        outs = []
        for i, b in enumerate(self.blocks):
            x = b(x)
            if self.feature_idx and i in self.feature_idx:
                outs.append(x)
        return outs if self.feature_idx else [x]

    def __call__(self, x):
        x = self.features(x)[-1]
        if self.with_pool:
            x = self.pool(x)
        if self.num_classes > 0:
            x = self.fc(x)
        return x


def mobilenet_v1(pretrained=False, scale=1.0, **kwargs):
    return MobileNetV1(scale=scale, **kwargs)
