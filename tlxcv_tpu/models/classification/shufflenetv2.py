"""ShuffleNetV2 (reference tlxcv/models/classification/shufflenetv2.py,
paddle2tlx-converted), NHWC with an XLA-friendly channel shuffle."""
from __future__ import annotations

import jax.numpy as jnp

from ... import nn

__all__ = ["ShuffleNetV2", "shufflenet_v2_x0_25", "shufflenet_v2_x0_33",
           "shufflenet_v2_x0_5", "shufflenet_v2_x1_0", "shufflenet_v2_x1_5",
           "shufflenet_v2_x2_0"]


def channel_shuffle(x, groups=2):
    n, h, w, c = x.shape
    x = x.reshape(n, h, w, groups, c // groups)
    x = jnp.swapaxes(x, -1, -2)
    return x.reshape(n, h, w, c)


class ConvBN(nn.Module):
    def __init__(self, cin, cout, k, stride=1, groups=1, act="relu"):
        self.conv = nn.Conv2d(cin, cout, k, stride=stride, padding=k // 2,
                              groups=groups, bias=False)
        self.bn = nn.BatchNorm(cout)
        self.act = nn.get_activation(act) if act else None

    def __call__(self, x):
        x = self.bn(self.conv(x))
        return self.act(x) if self.act else x


class InvertedUnit(nn.Module):
    def __init__(self, cin, cout, stride):
        self.stride = stride
        branch = cout // 2
        if stride > 1:
            self.b1_dw = ConvBN(cin, cin, 3, stride, groups=cin, act=None)
            self.b1_pw = ConvBN(cin, branch, 1)
            in2 = cin
        else:
            in2 = cin // 2
        self.b2_pw1 = ConvBN(in2, branch, 1)
        self.b2_dw = ConvBN(branch, branch, 3, stride, groups=branch, act=None)
        self.b2_pw2 = ConvBN(branch, branch, 1)

    def __call__(self, x):
        if self.stride > 1:
            x1 = self.b1_pw(self.b1_dw(x))
            x2 = x
        else:
            x1, x2 = jnp.split(x, 2, axis=-1)
        x2 = self.b2_pw2(self.b2_dw(self.b2_pw1(x2)))
        return channel_shuffle(jnp.concatenate([x1, x2], -1))


_CHANNELS = {
    0.25: (24, 24, 48, 96, 512), 0.33: (24, 32, 64, 128, 512),
    0.5: (24, 48, 96, 192, 1024), 1.0: (24, 116, 232, 464, 1024),
    1.5: (24, 176, 352, 704, 1024), 2.0: (24, 244, 488, 976, 2048),
}
_REPEATS = (4, 8, 4)


class ShuffleNetV2(nn.Module):
    def __init__(self, scale=1.0, num_classes=1000):
        chs = _CHANNELS[scale]
        self.stem = ConvBN(3, chs[0], 3, 2)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        blocks = []
        cin = chs[0]
        for stage, reps in enumerate(_REPEATS):
            cout = chs[stage + 1]
            for i in range(reps):
                blocks.append(InvertedUnit(cin, cout, 2 if i == 0 else 1))
                cin = cout
        self.blocks = blocks
        self.head = ConvBN(cin, chs[-1], 1)
        self.pool = nn.GlobalAvgPool2d()
        self.fc = nn.Linear(chs[-1], num_classes)

    def __call__(self, x):
        x = self.maxpool(self.stem(x))
        for b in self.blocks:
            x = b(x)
        return self.fc(self.pool(self.head(x)))


def shufflenet_v2_x0_25(pretrained=False, **kw):
    return ShuffleNetV2(0.25, **kw)


def shufflenet_v2_x0_33(pretrained=False, **kw):
    return ShuffleNetV2(0.33, **kw)


def shufflenet_v2_x0_5(pretrained=False, **kw):
    return ShuffleNetV2(0.5, **kw)


def shufflenet_v2_x1_0(pretrained=False, **kw):
    return ShuffleNetV2(1.0, **kw)


def shufflenet_v2_x1_5(pretrained=False, **kw):
    return ShuffleNetV2(1.5, **kw)


def shufflenet_v2_x2_0(pretrained=False, **kw):
    return ShuffleNetV2(2.0, **kw)
