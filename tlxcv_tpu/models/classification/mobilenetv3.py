"""MobileNetV3 small/large (reference
tlxcv/models/classification/mobilenetv3.py, paddle2tlx-converted), NHWC."""
from __future__ import annotations

from ... import nn
from .utils import make_divisible

__all__ = ["MobileNetV3", "mobilenet_v3_small", "mobilenet_v3_large"]


class SqueezeExcite(nn.Module):
    def __init__(self, channels, reduction=4):
        mid = make_divisible(channels // reduction, 8)
        self.fc1 = nn.Conv2d(channels, mid, 1)
        self.fc2 = nn.Conv2d(mid, channels, 1)

    def __call__(self, x):
        s = x.mean(axis=(1, 2), keepdims=True)
        s = nn.relu(self.fc1(s))
        s = nn.hardsigmoid(self.fc2(s))
        return x * s


class Bneck(nn.Module):
    def __init__(self, cin, exp, cout, k, stride, use_se, act):
        self.use_res = stride == 1 and cin == cout
        self.expand = exp != cin
        if self.expand:
            self.conv1 = nn.Conv2d(cin, exp, 1, bias=False)
            self.bn1 = nn.BatchNorm(exp)
        self.conv2 = nn.Conv2d(exp, exp, k, stride=stride, padding=k // 2,
                               groups=exp, bias=False)
        self.bn2 = nn.BatchNorm(exp)
        self.se = SqueezeExcite(exp) if use_se else None
        self.conv3 = nn.Conv2d(exp, cout, 1, bias=False)
        self.bn3 = nn.BatchNorm(cout)
        self.act = nn.get_activation(act)

    def __call__(self, x):
        out = x
        if self.expand:
            out = self.act(self.bn1(self.conv1(out)))
        out = self.act(self.bn2(self.conv2(out)))
        if self.se is not None:
            out = self.se(out)
        out = self.bn3(self.conv3(out))
        return x + out if self.use_res else out


_LARGE = [  # k, exp, out, se, act, stride
    (3, 16, 16, False, "relu", 1), (3, 64, 24, False, "relu", 2),
    (3, 72, 24, False, "relu", 1), (5, 72, 40, True, "relu", 2),
    (5, 120, 40, True, "relu", 1), (5, 120, 40, True, "relu", 1),
    (3, 240, 80, False, "hardswish", 2), (3, 200, 80, False, "hardswish", 1),
    (3, 184, 80, False, "hardswish", 1), (3, 184, 80, False, "hardswish", 1),
    (3, 480, 112, True, "hardswish", 1), (3, 672, 112, True, "hardswish", 1),
    (5, 672, 160, True, "hardswish", 2), (5, 960, 160, True, "hardswish", 1),
    (5, 960, 160, True, "hardswish", 1),
]
_SMALL = [
    (3, 16, 16, True, "relu", 2), (3, 72, 24, False, "relu", 2),
    (3, 88, 24, False, "relu", 1), (5, 96, 40, True, "hardswish", 2),
    (5, 240, 40, True, "hardswish", 1), (5, 240, 40, True, "hardswish", 1),
    (5, 120, 48, True, "hardswish", 1), (5, 144, 48, True, "hardswish", 1),
    (5, 288, 96, True, "hardswish", 2), (5, 576, 96, True, "hardswish", 1),
    (5, 576, 96, True, "hardswish", 1),
]


class MobileNetV3(nn.Module):
    def __init__(self, config="large", scale=1.0, num_classes=1000,
                 with_pool=True):
        cfg = _LARGE if config == "large" else _SMALL
        last_exp = 960 if config == "large" else 576
        s = lambda c: make_divisible(c * scale, 8)
        self.stem_conv = nn.Conv2d(3, s(16), 3, stride=2, padding=1, bias=False)
        self.stem_bn = nn.BatchNorm(s(16))
        blocks = []
        cin = s(16)
        for k, exp, out, se, act, stride in cfg:
            blocks.append(Bneck(cin, s(exp), s(out), k, stride, se, act))
            cin = s(out)
        self.blocks = blocks
        self.last_conv = nn.Conv2d(cin, s(last_exp), 1, bias=False)
        self.last_bn = nn.BatchNorm(s(last_exp))
        self.with_pool = with_pool
        self.num_classes = num_classes
        if with_pool:
            self.pool = nn.GlobalAvgPool2d()
        if num_classes > 0:
            self.classifier = nn.Sequential(
                nn.Linear(s(last_exp), 1280), nn.Activation("hardswish"),
                nn.Dropout(0.2), nn.Linear(1280, num_classes))

    def __call__(self, x):
        x = nn.hardswish(self.stem_bn(self.stem_conv(x)))
        for b in self.blocks:
            x = b(x)
        x = nn.hardswish(self.last_bn(self.last_conv(x)))
        if self.with_pool:
            x = self.pool(x)
        if self.num_classes > 0:
            x = self.classifier(x)
        return x


def mobilenet_v3_small(pretrained=False, scale=1.0, **kw):
    return MobileNetV3("small", scale, **kw)


def mobilenet_v3_large(pretrained=False, scale=1.0, **kw):
    return MobileNetV3("large", scale, **kw)
