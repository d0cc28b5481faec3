"""MobileNetV2 (reference tlxcv/models/classification/mobilenetv2.py,
paddle2tlx-converted), NHWC re-design."""
from __future__ import annotations

from ... import nn
from .utils import make_divisible

__all__ = ["MobileNetV2", "mobilenet_v2"]


class ConvBNReLU6(nn.Module):
    def __init__(self, cin, cout, k=3, stride=1, groups=1):
        self.conv = nn.Conv2d(cin, cout, k, stride=stride, padding=(k - 1) // 2,
                              groups=groups, bias=False)
        self.bn = nn.BatchNorm(cout)

    def __call__(self, x):
        return nn.relu6(self.bn(self.conv(x)))


class InvertedResidual(nn.Module):
    def __init__(self, cin, cout, stride, expand_ratio):
        hidden = int(round(cin * expand_ratio))
        self.use_res = stride == 1 and cin == cout
        layers = []
        if expand_ratio != 1:
            layers.append(ConvBNReLU6(cin, hidden, 1))
        layers += [
            ConvBNReLU6(hidden, hidden, 3, stride, groups=hidden),
            nn.Conv2d(hidden, cout, 1, bias=False),
            nn.BatchNorm(cout),
        ]
        self.conv = nn.Sequential(*layers)

    def __call__(self, x):
        out = self.conv(x)
        return x + out if self.use_res else out


_CFG = [  # t, c, n, s
    (1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
    (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1),
]


class MobileNetV2(nn.Module):
    def __init__(self, scale=1.0, num_classes=1000, with_pool=True):
        input_channel = make_divisible(32 * scale, 8)
        last_channel = make_divisible(1280 * max(1.0, scale), 8)
        features = [ConvBNReLU6(3, input_channel, 3, 2)]
        for t, c, n, s in _CFG:
            out = make_divisible(c * scale, 8)
            for i in range(n):
                features.append(InvertedResidual(
                    input_channel, out, s if i == 0 else 1, t))
                input_channel = out
        features.append(ConvBNReLU6(input_channel, last_channel, 1))
        self.features = nn.Sequential(*features)
        self.with_pool = with_pool
        self.num_classes = num_classes
        if with_pool:
            self.pool = nn.GlobalAvgPool2d()
        if num_classes > 0:
            self.classifier = nn.Sequential(
                nn.Dropout(0.2), nn.Linear(last_channel, num_classes))

    def __call__(self, x):
        x = self.features(x)
        if self.with_pool:
            x = self.pool(x)
        if self.num_classes > 0:
            x = self.classifier(x)
        return x


def mobilenet_v2(pretrained=False, scale=1.0, **kwargs):
    return MobileNetV2(scale=scale, **kwargs)
