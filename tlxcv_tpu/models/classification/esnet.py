"""ESNet and PP-LCNetV2 (reference tlxcv/models/classification/
{esnet.py, pp_lcnet_v2.py}, paddle2tlx-converted), NHWC."""
from __future__ import annotations

import jax.numpy as jnp

from ... import nn
from .shufflenetv2 import channel_shuffle
from .utils import make_divisible

__all__ = ["ESNet", "esnet_x1_0", "PPLCNetV2", "pp_lcnet_v2"]


class ConvBNAct(nn.Module):
    def __init__(self, cin, cout, k, stride=1, groups=1, act="hardswish"):
        self.conv = nn.Conv2d(cin, cout, k, stride=stride, padding=k // 2,
                              groups=groups, bias=False)
        self.bn = nn.BatchNorm(cout)
        self.act = nn.get_activation(act) if act else None

    def __call__(self, x):
        x = self.bn(self.conv(x))
        return self.act(x) if self.act else x


class SE(nn.Module):
    def __init__(self, ch, ratio=4):
        self.fc1 = nn.Conv2d(ch, ch // ratio, 1)
        self.fc2 = nn.Conv2d(ch // ratio, ch, 1)

    def __call__(self, x):
        s = x.mean(axis=(1, 2), keepdims=True)
        return x * nn.hardsigmoid(self.fc2(nn.relu(self.fc1(s))))


class ESBlock1(nn.Module):
    """Stride-1 block: split, pw+se on one half, shuffle."""

    def __init__(self, ch):
        half = ch // 2
        self.pw1 = ConvBNAct(half, half, 1)
        self.dw = ConvBNAct(half, half, 3, groups=half, act=None)
        self.se = SE(half)
        self.pw2 = ConvBNAct(half, half, 1)

    def __call__(self, x):
        x1, x2 = jnp.split(x, 2, axis=-1)
        y = self.pw1(x2)
        y = self.pw2(self.se(self.dw(y)))
        return channel_shuffle(jnp.concatenate([x1, y], -1))


class ESBlock2(nn.Module):
    """Stride-2 block: dual branch downsample."""

    def __init__(self, cin, cout):
        half = cout // 2
        self.b1_dw = ConvBNAct(cin, cin, 3, stride=2, groups=cin, act=None)
        self.b1_pw = ConvBNAct(cin, half, 1)
        self.b2_pw1 = ConvBNAct(cin, half, 1)
        self.b2_dw = ConvBNAct(half, half, 3, stride=2, groups=half, act=None)
        self.b2_se = SE(half)
        self.b2_pw2 = ConvBNAct(half, half, 1)
        self.dp = ConvBNAct(cout, cout, 3, groups=cout, act=None)
        self.pw = ConvBNAct(cout, cout, 1)

    def __call__(self, x):
        y1 = self.b1_pw(self.b1_dw(x))
        y2 = self.b2_pw2(self.b2_se(self.b2_dw(self.b2_pw1(x))))
        y = jnp.concatenate([y1, y2], -1)
        return channel_shuffle(self.pw(self.dp(y)))


class ESNet(nn.Module):
    def __init__(self, scale=1.0, num_classes=1000,
                 stage_repeats=(3, 7, 3),
                 stage_out=(116, 232, 464)):
        s = lambda c: make_divisible(c * scale, 8)
        self.stem = ConvBNAct(3, s(24), 3, 2)
        self.pool = nn.MaxPool2d(3, 2, 1)
        blocks = []
        cin = s(24)
        for n, c in zip(stage_repeats, stage_out):
            blocks.append(ESBlock2(cin, s(c)))
            for _ in range(n):
                blocks.append(ESBlock1(s(c)))
            cin = s(c)
        self.blocks = blocks
        self.head = ConvBNAct(cin, 1024, 1)
        self.gap = nn.GlobalAvgPool2d()
        self.fc = nn.Linear(1024, num_classes)

    def __call__(self, x):
        x = self.pool(self.stem(x))
        for b in self.blocks:
            x = b(x)
        return self.fc(self.gap(self.head(x)))


def esnet_x1_0(pretrained=False, **kw):
    return ESNet(1.0, **kw)


def esnet_x0_5(pretrained=False, **kw):
    return ESNet(0.5, **kw)


class LCV2Block(nn.Module):
    def __init__(self, cin, cout, stride, dw_size=3, use_se=False,
                 shortcut=True):
        self.dw1 = ConvBNAct(cin, cin, dw_size, stride=stride, groups=cin,
                             act=None)
        self.se = SE(cin) if use_se else None
        self.pw1 = ConvBNAct(cin, cout, 1)
        self.shortcut = shortcut and stride == 1 and cin == cout

    def __call__(self, x):
        y = self.dw1(x)
        if self.se is not None:
            y = self.se(y)
        y = self.pw1(y)
        return x + y if self.shortcut else y


class PPLCNetV2(nn.Module):
    def __init__(self, scale=1.0, num_classes=1000, dropout=0.2):
        s = lambda c: make_divisible(c * scale, 8)
        self.stem = nn.Sequential(ConvBNAct(3, s(32), 3, 2),
                                  LCV2Block(s(32), s(64), 1))
        cfg = [  # cout, blocks, stride stage entry
            (128, 2), (256, 2), (512, 4), (1024, 2)]
        blocks = []
        cin = s(64)
        for ci, (cout, n) in enumerate(cfg):
            for bi in range(n):
                blocks.append(LCV2Block(cin, s(cout), 2 if bi == 0 else 1,
                                        dw_size=5 if ci >= 2 else 3,
                                        use_se=(ci == 3 and bi > 0)))
                cin = s(cout)
        self.blocks = blocks
        self.gap = nn.GlobalAvgPool2d(keepdims=True)
        self.last = nn.Conv2d(cin, 1280, 1)
        self.drop = nn.Dropout(dropout)
        self.fc = nn.Linear(1280, num_classes)

    def __call__(self, x):
        x = self.stem(x)
        for b in self.blocks:
            x = b(x)
        x = nn.hardswish(self.last(self.gap(x)))
        return self.fc(self.drop(x[:, 0, 0, :]))


def pp_lcnet_v2(pretrained=False, scale=1.0, **kw):
    return PPLCNetV2(scale, **kw)
