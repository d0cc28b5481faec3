"""Zoo parity wave 5: rednet (involution), xception, inception_v3,
mobilenet_v2 torch oracles (golden battery -> 23 archs).

Reference architectures: tlxcv/models/classification/{rednet.py,
xception.py, inceptionv3.py, mobilenetv2.py}.
"""
import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

from tests.test_parity_zoo import _x, roundtrip

torch.manual_seed(4)


# ----------------------------------------------------------------- rednet
class TInvolution(tnn.Module):
    """Official involution (weight-generating conv + unfold gather) —
    oracle for the framework's unfold-based Involution."""

    def __init__(self, channels, kernel_size=7, stride=1, group_channels=16,
                 reduction=4):
        super().__init__()
        self.k, self.stride = kernel_size, stride
        self.groups = channels // group_channels
        self.group_channels = group_channels
        self.reduce_conv = tnn.Conv2d(channels, channels // reduction, 1,
                                      bias=False)
        self.reduce_bn = tnn.BatchNorm2d(channels // reduction)
        self.span = tnn.Conv2d(channels // reduction,
                               self.groups * kernel_size ** 2, 1)
        self.pool = tnn.AvgPool2d(stride, stride) if stride > 1 else None

    def forward(self, x):
        k = self.k
        ref = x if self.pool is None else self.pool(x)
        w = self.span(torch.relu(self.reduce_bn(self.reduce_conv(ref))))
        b, _, oh, ow = w.shape
        w = w.view(b, self.groups, k * k, oh, ow).unsqueeze(2)
        patches = F.unfold(x, k, stride=self.stride, padding=(k - 1) // 2)
        patches = patches.view(b, self.groups, self.group_channels, k * k,
                               oh, ow)
        return (w * patches).sum(dim=3).reshape(b, -1, oh, ow)


class TBottleneckRed(tnn.Module):
    def __init__(self, cin, planes, stride=1, downsample=False):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.inv = TInvolution(planes, 7, stride)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.downsample = None
        if downsample:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, planes * 4, 1, stride, bias=False),
                tnn.BatchNorm2d(planes * 4))

    def forward(self, x):
        out = torch.relu(self.bn1(self.conv1(x)))
        out = torch.relu(self.bn2(self.inv(out)))
        out = self.bn3(self.conv3(out))
        idn = x if self.downsample is None else self.downsample(x)
        return torch.relu(out + idn)


class TRedNet26(tnn.Module):
    def __init__(self, num_classes=10):
        super().__init__()
        self.stem_conv = tnn.Conv2d(3, 32, 3, 2, 1, bias=False)
        self.stem_bn = tnn.BatchNorm2d(32)
        self.stem_inv = TInvolution(32, 3, 1)
        self.stem2_bn = tnn.BatchNorm2d(32)
        self.stem2_conv = tnn.Conv2d(32, 64, 3, 1, 1, bias=False)
        self.stem2_bn2 = tnn.BatchNorm2d(64)
        blocks, cin = [], 64
        for si, (n, planes) in enumerate(zip((1, 2, 4, 1),
                                             (64, 128, 256, 512))):
            for bi in range(n):
                stride = 2 if (bi == 0 and si > 0) else 1
                blocks.append(TBottleneckRed(cin, planes, stride,
                                             downsample=(bi == 0)))
                cin = planes * 4
        self.blocks = tnn.ModuleList(blocks)
        self.fc = tnn.Linear(cin, num_classes)

    def forward(self, x):
        x = torch.relu(self.stem_bn(self.stem_conv(x)))
        x = self.stem_inv(x)
        x = torch.relu(self.stem2_bn(x))
        x = torch.relu(self.stem2_bn2(self.stem2_conv(x)))
        x = F.max_pool2d(x, 3, 2, 1)
        for b in self.blocks:
            x = b(x)
        return self.fc(x.mean(dim=(2, 3)))


def test_rednet26_parity(rng):
    from tlxcv_tpu.models.classification import rednet26

    roundtrip(TRedNet26(), rednet26(num_classes=10), _x(rng, 64), atol=5e-4)


# ---------------------------------------------------------------- xception
class TSepConv(tnn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.dw = tnn.Conv2d(cin, cin, 3, stride, 1, groups=cin, bias=False)
        self.pw = tnn.Conv2d(cin, cout, 1, bias=False)
        self.bn = tnn.BatchNorm2d(cout)

    def forward(self, x):
        return self.bn(self.pw(self.dw(x)))


class TXceptionBlock(tnn.Module):
    def __init__(self, cin, cout, reps, stride=1, start_with_relu=True,
                 grow_first=True):
        super().__init__()
        self.skip = cout != cin or stride != 1
        if self.skip:
            # declared before the seps to mirror the framework's
            # attribute order (XceptionBlock.skip_conv/skip_bn first)
            self.skip_conv = tnn.Conv2d(cin, cout, 1, stride, bias=False)
            self.skip_bn = tnn.BatchNorm2d(cout)
        seps, c = [], cin
        for i in range(reps):
            out = cout if (grow_first or i == reps - 1) else cin
            seps.append(TSepConv(c, out))
            c = out
        self.seps = tnn.ModuleList(seps)
        self.relu_first = start_with_relu
        self.pool = stride != 1

    def forward(self, x):
        out = x
        for i, sep in enumerate(self.seps):
            if i > 0 or self.relu_first:
                out = torch.relu(out)
            out = sep(out)
        if self.pool:
            out = F.max_pool2d(out, 3, 2, 1)
        skip = self.skip_bn(self.skip_conv(x)) if self.skip else x
        return out + skip


class TXception(tnn.Module):
    def __init__(self, num_classes=10):
        super().__init__()
        self.stem = tnn.Sequential(
            tnn.Conv2d(3, 32, 3, 2, 0, bias=False), tnn.BatchNorm2d(32),
            tnn.ReLU(), tnn.Conv2d(32, 64, 3, bias=False),
            tnn.BatchNorm2d(64), tnn.ReLU())
        self.block1 = TXceptionBlock(64, 128, 2, 2, start_with_relu=False)
        self.block2 = TXceptionBlock(128, 256, 2, 2)
        self.block3 = TXceptionBlock(256, 728, 2, 2)
        self.middle = tnn.ModuleList(
            TXceptionBlock(728, 728, 3) for _ in range(8))
        self.block12 = TXceptionBlock(728, 1024, 2, 2, grow_first=False)
        self.conv3 = TSepConv(1024, 1536)
        self.conv4 = TSepConv(1536, 2048)
        self.fc = tnn.Linear(2048, num_classes)

    def forward(self, x):
        x = self.stem(x)
        x = self.block3(self.block2(self.block1(x)))
        for blk in self.middle:
            x = blk(x)
        x = self.block12(x)
        x = torch.relu(self.conv3(x))
        x = torch.relu(self.conv4(x))
        return self.fc(x.mean(dim=(2, 3)))


def test_xception_parity(rng):
    from tlxcv_tpu.models.classification import xception41

    roundtrip(TXception(), xception41(num_classes=10), _x(rng, 64),
              atol=5e-4)


# ------------------------------------------------------------ inception_v3
class TBasicConv(tnn.Module):
    def __init__(self, cin, cout, k, stride=1, padding=0):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, k, stride, padding, bias=False)
        self.bn = tnn.BatchNorm2d(cout, eps=0.001)

    def forward(self, x):
        return torch.relu(self.bn(self.conv(x)))


def _avg3(x):
    # exclude-pad averaging (paddle exclusive=True, like the framework)
    return F.avg_pool2d(x, 3, 1, 1, count_include_pad=False)


class TInceptionA(tnn.Module):
    def __init__(self, cin, pool_features):
        super().__init__()
        self.b1x1 = TBasicConv(cin, 64, 1)
        self.b5x5_1 = TBasicConv(cin, 48, 1)
        self.b5x5_2 = TBasicConv(48, 64, 5, padding=2)
        self.b3x3_1 = TBasicConv(cin, 64, 1)
        self.b3x3_2 = TBasicConv(64, 96, 3, padding=1)
        self.b3x3_3 = TBasicConv(96, 96, 3, padding=1)
        self.bpool = TBasicConv(cin, pool_features, 1)

    def forward(self, x):
        return torch.cat([
            self.b1x1(x), self.b5x5_2(self.b5x5_1(x)),
            self.b3x3_3(self.b3x3_2(self.b3x3_1(x))),
            self.bpool(_avg3(x))], 1)


class TInceptionB(tnn.Module):
    def __init__(self, cin):
        super().__init__()
        self.b3x3 = TBasicConv(cin, 384, 3, stride=2)
        self.b3x3d_1 = TBasicConv(cin, 64, 1)
        self.b3x3d_2 = TBasicConv(64, 96, 3, padding=1)
        self.b3x3d_3 = TBasicConv(96, 96, 3, stride=2)

    def forward(self, x):
        return torch.cat([
            self.b3x3(x), self.b3x3d_3(self.b3x3d_2(self.b3x3d_1(x))),
            F.max_pool2d(x, 3, 2)], 1)


class TInceptionC(tnn.Module):
    def __init__(self, cin, c7):
        super().__init__()
        self.b1x1 = TBasicConv(cin, 192, 1)
        self.b7_1 = TBasicConv(cin, c7, 1)
        self.b7_2 = TBasicConv(c7, c7, (1, 7), padding=(0, 3))
        self.b7_3 = TBasicConv(c7, 192, (7, 1), padding=(3, 0))
        self.b7d_1 = TBasicConv(cin, c7, 1)
        self.b7d_2 = TBasicConv(c7, c7, (7, 1), padding=(3, 0))
        self.b7d_3 = TBasicConv(c7, c7, (1, 7), padding=(0, 3))
        self.b7d_4 = TBasicConv(c7, c7, (7, 1), padding=(3, 0))
        self.b7d_5 = TBasicConv(c7, 192, (1, 7), padding=(0, 3))
        self.bpool = TBasicConv(cin, 192, 1)

    def forward(self, x):
        return torch.cat([
            self.b1x1(x), self.b7_3(self.b7_2(self.b7_1(x))),
            self.b7d_5(self.b7d_4(self.b7d_3(self.b7d_2(self.b7d_1(x))))),
            self.bpool(_avg3(x))], 1)


class TInceptionD(tnn.Module):
    def __init__(self, cin):
        super().__init__()
        self.b3_1 = TBasicConv(cin, 192, 1)
        self.b3_2 = TBasicConv(192, 320, 3, stride=2)
        self.b7_1 = TBasicConv(cin, 192, 1)
        self.b7_2 = TBasicConv(192, 192, (1, 7), padding=(0, 3))
        self.b7_3 = TBasicConv(192, 192, (7, 1), padding=(3, 0))
        self.b7_4 = TBasicConv(192, 192, 3, stride=2)

    def forward(self, x):
        return torch.cat([
            self.b3_2(self.b3_1(x)),
            self.b7_4(self.b7_3(self.b7_2(self.b7_1(x)))),
            F.max_pool2d(x, 3, 2)], 1)


class TInceptionE(tnn.Module):
    def __init__(self, cin):
        super().__init__()
        self.b1x1 = TBasicConv(cin, 320, 1)
        self.b3_1 = TBasicConv(cin, 384, 1)
        self.b3_2a = TBasicConv(384, 384, (1, 3), padding=(0, 1))
        self.b3_2b = TBasicConv(384, 384, (3, 1), padding=(1, 0))
        self.b3d_1 = TBasicConv(cin, 448, 1)
        self.b3d_2 = TBasicConv(448, 384, 3, padding=1)
        self.b3d_3a = TBasicConv(384, 384, (1, 3), padding=(0, 1))
        self.b3d_3b = TBasicConv(384, 384, (3, 1), padding=(1, 0))
        self.bpool = TBasicConv(cin, 192, 1)

    def forward(self, x):
        b3 = self.b3_1(x)
        b3 = torch.cat([self.b3_2a(b3), self.b3_2b(b3)], 1)
        b3d = self.b3d_2(self.b3d_1(x))
        b3d = torch.cat([self.b3d_3a(b3d), self.b3d_3b(b3d)], 1)
        return torch.cat([self.b1x1(x), b3, b3d, self.bpool(_avg3(x))], 1)


class TInceptionV3(tnn.Module):
    def __init__(self, num_classes=10):
        super().__init__()
        self.stem = tnn.Sequential(
            TBasicConv(3, 32, 3, stride=2), TBasicConv(32, 32, 3),
            TBasicConv(32, 64, 3, padding=1), tnn.MaxPool2d(3, 2),
            TBasicConv(64, 80, 1), TBasicConv(80, 192, 3),
            tnn.MaxPool2d(3, 2))
        self.blocks = tnn.ModuleList([
            TInceptionA(192, 32), TInceptionA(256, 64), TInceptionA(288, 64),
            TInceptionB(288),
            TInceptionC(768, 128), TInceptionC(768, 160),
            TInceptionC(768, 160), TInceptionC(768, 192),
            TInceptionD(768),
            TInceptionE(1280), TInceptionE(2048)])
        self.fc = tnn.Linear(2048, num_classes)

    def forward(self, x):
        x = self.stem(x)
        for b in self.blocks:
            x = b(x)
        return self.fc(x.mean(dim=(2, 3)))


def test_inception_v3_parity(rng):
    from tlxcv_tpu.models.classification import inception_v3

    roundtrip(TInceptionV3(), inception_v3(num_classes=10), _x(rng, 96),
              atol=5e-4)


# ------------------------------------------------------------ mobilenet_v2
class TConvBNReLU6(tnn.Module):
    def __init__(self, cin, cout, k=3, stride=1, groups=1):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, k, stride, (k - 1) // 2,
                               groups=groups, bias=False)
        self.bn = tnn.BatchNorm2d(cout)

    def forward(self, x):
        return F.relu6(self.bn(self.conv(x)))


class TInvertedResidual(tnn.Module):
    def __init__(self, cin, cout, stride, expand):
        super().__init__()
        hidden = int(round(cin * expand))
        self.use_res = stride == 1 and cin == cout
        layers = []
        if expand != 1:
            layers.append(TConvBNReLU6(cin, hidden, 1))
        layers += [TConvBNReLU6(hidden, hidden, 3, stride, groups=hidden),
                   tnn.Conv2d(hidden, cout, 1, bias=False),
                   tnn.BatchNorm2d(cout)]
        self.conv = tnn.Sequential(*layers)

    def forward(self, x):
        out = self.conv(x)
        return x + out if self.use_res else out


class TMobileNetV2(tnn.Module):
    CFG = [(1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
           (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1)]

    def __init__(self, num_classes=10):
        super().__init__()
        feats, cin = [TConvBNReLU6(3, 32, 3, 2)], 32
        for t, c, n, s in self.CFG:
            for i in range(n):
                feats.append(TInvertedResidual(cin, c, s if i == 0 else 1, t))
                cin = c
        feats.append(TConvBNReLU6(cin, 1280, 1))
        self.features = tnn.Sequential(*feats)
        self.fc = tnn.Linear(1280, num_classes)

    def forward(self, x):
        x = self.features(x).mean(dim=(2, 3))
        return self.fc(x)


def test_mobilenet_v2_parity(rng):
    from tlxcv_tpu.models.classification import mobilenet_v2

    roundtrip(TMobileNetV2(), mobilenet_v2(num_classes=10), _x(rng, 64),
              atol=5e-4)
