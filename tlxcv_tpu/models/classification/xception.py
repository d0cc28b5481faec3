"""Xception (reference tlxcv/models/classification/xception.py,
paddle2tlx-converted), NHWC."""
from __future__ import annotations

from ... import nn

__all__ = ["Xception", "xception41", "xception"]


class SeparableConv(nn.Module):
    def __init__(self, cin, cout, stride=1):
        self.dw = nn.Conv2d(cin, cin, 3, stride=stride, padding=1, groups=cin,
                            bias=False)
        self.pw = nn.Conv2d(cin, cout, 1, bias=False)
        self.bn = nn.BatchNorm(cout)

    def __call__(self, x):
        return self.bn(self.pw(self.dw(x)))


class XceptionBlock(nn.Module):
    def __init__(self, cin, cout, reps, stride=1, start_with_relu=True,
                 grow_first=True):
        self.skip = None
        if cout != cin or stride != 1:
            self.skip_conv = nn.Conv2d(cin, cout, 1, stride=stride, bias=False)
            self.skip_bn = nn.BatchNorm(cout)
            self.skip = True
        layers = []
        c = cin
        for i in range(reps):
            out = cout if (grow_first or i == reps - 1) else cin
            layers.append(("relu", None))
            layers.append(("sep", SeparableConv(c, out)))
            c = out
        if not start_with_relu:
            layers = layers[1:]
        self.seps = [l for kind, l in layers if kind == "sep"]
        self.relu_first = start_with_relu
        self.stride = stride
        self.pool = nn.MaxPool2d(3, stride, 1) if stride != 1 else None

    def __call__(self, x):
        out = x
        for i, sep in enumerate(self.seps):
            if i > 0 or self.relu_first:
                out = nn.relu(out)
            out = sep(out)
        if self.pool is not None:
            out = self.pool(out)
        skip = self.skip_bn(self.skip_conv(x)) if self.skip else x
        return out + skip


class Xception(nn.Module):
    def __init__(self, num_classes=1000, middle_blocks=8):
        self.stem = nn.Sequential(
            nn.Conv2d(3, 32, 3, stride=2, bias=False), nn.BatchNorm(32),
            nn.Activation("relu"),
            nn.Conv2d(32, 64, 3, bias=False), nn.BatchNorm(64),
            nn.Activation("relu"))
        self.block1 = XceptionBlock(64, 128, 2, 2, start_with_relu=False)
        self.block2 = XceptionBlock(128, 256, 2, 2)
        self.block3 = XceptionBlock(256, 728, 2, 2)
        self.middle = [XceptionBlock(728, 728, 3)
                       for _ in range(middle_blocks)]
        self.block12 = XceptionBlock(728, 1024, 2, 2, grow_first=False)
        self.conv3 = SeparableConv(1024, 1536)
        self.conv4 = SeparableConv(1536, 2048)
        self.pool = nn.GlobalAvgPool2d()
        self.fc = nn.Linear(2048, num_classes)

    def __call__(self, x):
        x = self.stem(x)
        x = self.block3(self.block2(self.block1(x)))
        for blk in self.middle:
            x = blk(x)
        x = self.block12(x)
        x = nn.relu(self.conv3(x))
        x = nn.relu(self.conv4(x))
        return self.fc(self.pool(x))


def xception41(pretrained=False, **kw):
    return Xception(**kw)


def xception65(pretrained=False, **kw):
    # 16 middle-flow blocks (reference README.md:89 xception65)
    return Xception(middle_blocks=16, **kw)


xception = xception41
