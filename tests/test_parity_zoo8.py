"""Zoo parity wave 8: esnet (channel shuffle + SE), pp_lcnet, rexnet,
se_resnext50, resnest50 (split attention), peleenet (two-way dense),
hardnet68 (harmonic dense) torch oracles (golden battery -> 39 archs).

Reference architectures: tlxcv/models/classification/{esnet.py,
pp_lcnet.py, rexnet.py, se_resnext.py, resnest.py, peleenet.py,
hardnet.py}.
"""
import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

from tests.test_parity_zoo import _x, roundtrip

torch.manual_seed(7)


def _shuffle(x, groups=2):
    n, c, h, w = x.shape
    return x.reshape(n, groups, c // groups, h, w).transpose(1, 2) \
        .reshape(n, c, h, w)


class TConvBNAct(tnn.Module):
    def __init__(self, cin, cout, k, stride=1, groups=1, act="hardswish"):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, k, stride, k // 2, groups=groups,
                               bias=False)
        self.bn = tnn.BatchNorm2d(cout)
        self.act = act

    def forward(self, x):
        x = self.bn(self.conv(x))
        if self.act == "hardswish":
            return F.hardswish(x)
        if self.act == "relu":
            return torch.relu(x)
        return x


class THSE(tnn.Module):
    """SE with hard-sigmoid gate (esnet/pp_lcnet style)."""

    def __init__(self, ch, ratio=4):
        super().__init__()
        self.fc1 = tnn.Conv2d(ch, ch // ratio, 1)
        self.fc2 = tnn.Conv2d(ch // ratio, ch, 1)

    def forward(self, x):
        s = x.mean(dim=(2, 3), keepdim=True)
        return x * F.hardsigmoid(self.fc2(torch.relu(self.fc1(s))))


# ------------------------------------------------------------------- esnet
class TESBlock1(tnn.Module):
    def __init__(self, ch):
        super().__init__()
        half = ch // 2
        self.pw1 = TConvBNAct(half, half, 1)
        self.dw = TConvBNAct(half, half, 3, groups=half, act=None)
        self.se = THSE(half)
        self.pw2 = TConvBNAct(half, half, 1)

    def forward(self, x):
        x1, x2 = x.chunk(2, dim=1)
        y = self.pw2(self.se(self.dw(self.pw1(x2))))
        return _shuffle(torch.cat([x1, y], 1))


class TESBlock2(tnn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        half = cout // 2
        self.b1_dw = TConvBNAct(cin, cin, 3, stride=2, groups=cin, act=None)
        self.b1_pw = TConvBNAct(cin, half, 1)
        self.b2_pw1 = TConvBNAct(cin, half, 1)
        self.b2_dw = TConvBNAct(half, half, 3, stride=2, groups=half,
                                act=None)
        self.b2_se = THSE(half)
        self.b2_pw2 = TConvBNAct(half, half, 1)
        self.dp = TConvBNAct(cout, cout, 3, groups=cout, act=None)
        self.pw = TConvBNAct(cout, cout, 1)

    def forward(self, x):
        y1 = self.b1_pw(self.b1_dw(x))
        y2 = self.b2_pw2(self.b2_se(self.b2_dw(self.b2_pw1(x))))
        return _shuffle(self.pw(self.dp(torch.cat([y1, y2], 1))))


class TESNet(tnn.Module):
    def __init__(self, num_classes=10):
        super().__init__()
        self.stem = TConvBNAct(3, 24, 3, 2)
        blocks, cin = [], 24
        # stage widths go through make_divisible(c, 8): 116 -> 120
        for n, c in zip((3, 7, 3), (120, 232, 464)):
            blocks.append(TESBlock2(cin, c))
            blocks += [TESBlock1(c) for _ in range(n)]
            cin = c
        self.blocks = tnn.ModuleList(blocks)
        self.head = TConvBNAct(cin, 1024, 1)
        self.fc = tnn.Linear(1024, num_classes)

    def forward(self, x):
        x = F.max_pool2d(self.stem(x), 3, 2, 1)
        for b in self.blocks:
            x = b(x)
        return self.fc(self.head(x).mean(dim=(2, 3)))


def test_esnet_parity(rng):
    from tlxcv_tpu.models.classification import esnet_x1_0

    roundtrip(TESNet(), esnet_x1_0(num_classes=10), _x(rng, 64), atol=5e-4)


# ---------------------------------------------------------------- pp_lcnet
class TDWBlock(tnn.Module):
    def __init__(self, cin, cout, k, stride, use_se):
        super().__init__()
        self.dw = tnn.Conv2d(cin, cin, k, stride, k // 2, groups=cin,
                             bias=False)
        self.dw_bn = tnn.BatchNorm2d(cin)
        self.se = THSE(cin) if use_se else None
        self.pw = tnn.Conv2d(cin, cout, 1, bias=False)
        self.pw_bn = tnn.BatchNorm2d(cout)

    def forward(self, x):
        x = F.hardswish(self.dw_bn(self.dw(x)))
        if self.se is not None:
            x = self.se(x)
        return F.hardswish(self.pw_bn(self.pw(x)))


class TPPLCNet(tnn.Module):
    def __init__(self, num_classes=10):
        super().__init__()
        from tlxcv_tpu.models.classification.pp_lcnet import _CFG

        self.stem = tnn.Sequential(
            tnn.Conv2d(3, 16, 3, 2, 1, bias=False), tnn.BatchNorm2d(16),
            tnn.Hardswish())
        self.blocks = tnn.ModuleList(
            TDWBlock(cin, cout, k, st, se) for k, cin, cout, st, se in _CFG)
        self.last_conv = tnn.Conv2d(512, 1280, 1)
        self.fc = tnn.Linear(1280, num_classes)

    def forward(self, x):
        x = self.stem(x)
        for b in self.blocks:
            x = b(x)
        x = x.mean(dim=(2, 3), keepdim=True)
        x = F.hardswish(self.last_conv(x))
        return self.fc(x[:, :, 0, 0])


def test_pp_lcnet_parity(rng):
    from tlxcv_tpu.models.classification import pp_lcnet

    roundtrip(TPPLCNet(), pp_lcnet(num_classes=10), _x(rng, 64), atol=5e-4)


# ------------------------------------------------------------------ rexnet
class TRexSE(tnn.Module):
    def __init__(self, ch, se_ratio=12):
        super().__init__()
        mid = ch // se_ratio
        self.fc1 = tnn.Conv2d(ch, mid, 1)
        self.bn = tnn.BatchNorm2d(mid)
        self.fc2 = tnn.Conv2d(mid, ch, 1)

    def forward(self, x):
        s = x.mean(dim=(2, 3), keepdim=True)
        s = torch.relu(self.bn(self.fc1(s)))
        return x * torch.sigmoid(self.fc2(s))


class TLinearBottleneck(tnn.Module):
    def __init__(self, cin, cout, t, stride, use_se=True):
        super().__init__()
        self.use_shortcut = stride == 1 and cin <= cout
        self.cin, self.cout = cin, cout
        layers, ch = [], cin
        if t != 1:
            dw_ch = cin * t
            layers += [tnn.Conv2d(cin, dw_ch, 1, bias=False),
                       tnn.BatchNorm2d(dw_ch), tnn.SiLU()]
            ch = dw_ch
        layers += [tnn.Conv2d(ch, ch, 3, stride, 1, groups=ch, bias=False),
                   tnn.BatchNorm2d(ch)]
        self.body = tnn.Sequential(*layers)
        self.se = TRexSE(ch) if use_se else None
        self.proj = tnn.Sequential(tnn.Conv2d(ch, cout, 1, bias=False),
                                   tnn.BatchNorm2d(cout))

    def forward(self, x):
        out = self.body(x)
        if self.se is not None:
            out = self.se(out)
        out = self.proj(F.relu6(out))
        if self.use_shortcut:
            pad = self.cout - self.cin
            out = out + F.pad(x, (0, 0, 0, 0, 0, pad))
        return out


class TReXNet10(tnn.Module):
    def __init__(self, num_classes=10):
        super().__init__()
        from math import ceil

        layers = [1, 2, 2, 3, 3, 5]
        strides = [1, 2, 2, 2, 1, 2]
        depth = sum(layers)
        self.stem = tnn.Sequential(
            tnn.Conv2d(3, 32, 3, 2, 1, bias=False), tnn.BatchNorm2d(32),
            tnn.SiLU())
        strides_full = sum([[s] + [1] * (l - 1)
                            for s, l in zip(strides, layers)], [])
        ts = [1] * layers[0] + [6] * (depth - layers[0])
        blocks, cin, cur = [], 32, 16.0
        for i, (t, s) in enumerate(zip(ts, strides_full)):
            cout = int(round(cur * 1.0))
            blocks.append(TLinearBottleneck(cin, cout, t, s,
                                            use_se=i > layers[0]))
            cin = cout
            cur += 180 / depth
        self.blocks = tnn.ModuleList(blocks)
        self.head = tnn.Sequential(tnn.Conv2d(cin, 1280, 1, bias=False),
                                   tnn.BatchNorm2d(1280), tnn.SiLU())
        self.fc = tnn.Linear(1280, num_classes)

    def forward(self, x):
        x = self.stem(x)
        for b in self.blocks:
            x = b(x)
        return self.fc(self.head(x).mean(dim=(2, 3)))


def test_rexnet_parity(rng):
    from tlxcv_tpu.models.classification import rexnet_1_0

    roundtrip(TReXNet10(), rexnet_1_0(num_classes=10), _x(rng, 64),
              atol=5e-4)


# -------------------------------------------------------------- se_resnext
class TSEBlockLin(tnn.Module):
    def __init__(self, ch, reduction=16):
        super().__init__()
        self.fc1 = tnn.Linear(ch, ch // reduction)
        self.fc2 = tnn.Linear(ch // reduction, ch)

    def forward(self, x):
        s = x.mean(dim=(2, 3))
        s = torch.sigmoid(self.fc2(torch.relu(self.fc1(s))))
        return x * s[:, :, None, None]


class TSEResNeXtBlock(tnn.Module):
    def __init__(self, cin, planes, stride=1, cardinality=32, width=4,
                 downsample=False):
        super().__init__()
        d = planes * width * cardinality // 64
        self.conv1 = tnn.Sequential(tnn.Conv2d(cin, d, 1, bias=False),
                                    tnn.BatchNorm2d(d), tnn.ReLU())
        self.conv2 = tnn.Sequential(
            tnn.Conv2d(d, d, 3, stride, 1, groups=cardinality, bias=False),
            tnn.BatchNorm2d(d), tnn.ReLU())
        self.conv3 = tnn.Sequential(
            tnn.Conv2d(d, planes * 4, 1, bias=False),
            tnn.BatchNorm2d(planes * 4))
        self.se = TSEBlockLin(planes * 4)
        self.downsample = None
        if downsample:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, planes * 4, 1, stride, bias=False),
                tnn.BatchNorm2d(planes * 4))

    def forward(self, x):
        out = self.se(self.conv3(self.conv2(self.conv1(x))))
        idn = x if self.downsample is None else self.downsample(x)
        return torch.relu(out + idn)


class TSEResNeXt50(tnn.Module):
    def __init__(self, num_classes=10):
        super().__init__()
        self.stem = tnn.Sequential(
            tnn.Conv2d(3, 64, 7, 2, 3, bias=False), tnn.BatchNorm2d(64),
            tnn.ReLU(), tnn.MaxPool2d(3, 2, 1))
        blocks, cin = [], 64
        for si, (n, planes) in enumerate(zip((3, 4, 6, 3),
                                             (64, 128, 256, 512))):
            for bi in range(n):
                stride = 2 if (bi == 0 and si > 0) else 1
                blocks.append(TSEResNeXtBlock(cin, planes, stride,
                                              downsample=(bi == 0)))
                cin = planes * 4
        self.blocks = tnn.ModuleList(blocks)
        self.fc = tnn.Linear(cin, num_classes)

    def forward(self, x):
        x = self.stem(x)
        for b in self.blocks:
            x = b(x)
        return self.fc(x.mean(dim=(2, 3)))


def test_se_resnext50_parity(rng):
    from tlxcv_tpu.models.classification import se_resnext50_32x4d

    roundtrip(TSEResNeXt50(), se_resnext50_32x4d(num_classes=10),
              _x(rng, 64), atol=5e-4)


# ----------------------------------------------------------------- resnest
class TSplitAttention(tnn.Module):
    def __init__(self, cin, ch, radix=2, reduction=4):
        super().__init__()
        self.radix, self.ch = radix, ch
        self.conv = tnn.Sequential(
            tnn.Conv2d(cin, ch * radix, 3, 1, 1, groups=radix, bias=False),
            tnn.BatchNorm2d(ch * radix), tnn.ReLU())
        inter = max(ch * radix // reduction, 32)
        self.fc1 = tnn.Conv2d(ch, inter, 1)
        self.bn1 = tnn.BatchNorm2d(inter)
        self.fc2 = tnn.Conv2d(inter, ch * radix, 1)

    def forward(self, x):
        x = self.conv(x)
        b, _, h, w = x.shape
        splits = x.view(b, self.radix, self.ch, h, w)
        gap = splits.sum(dim=1).mean(dim=(2, 3), keepdim=True)
        att = self.fc2(torch.relu(self.bn1(self.fc1(gap))))
        att = att.view(b, self.radix, self.ch).softmax(dim=1)
        return (splits * att[:, :, :, None, None]).sum(dim=1)


class TResNeStBlock(tnn.Module):
    def __init__(self, cin, planes, stride=1, downsample=False):
        super().__init__()
        self.conv1 = tnn.Sequential(tnn.Conv2d(cin, planes, 1, bias=False),
                                    tnn.BatchNorm2d(planes), tnn.ReLU())
        self.splat = TSplitAttention(planes, planes)
        self.stride = stride
        self.conv3 = tnn.Sequential(
            tnn.Conv2d(planes, planes * 4, 1, bias=False),
            tnn.BatchNorm2d(planes * 4))
        self.downsample = None
        if downsample:
            mods = []
            if stride > 1:
                mods.append(tnn.AvgPool2d(stride, stride))
            mods += [tnn.Conv2d(cin, planes * 4, 1, bias=False),
                     tnn.BatchNorm2d(planes * 4)]
            self.downsample = tnn.Sequential(*mods)

    def forward(self, x):
        out = self.splat(self.conv1(x))
        if self.stride > 1:
            out = F.avg_pool2d(out, 3, self.stride, 1,
                               count_include_pad=False)
        out = self.conv3(out)
        idn = x if self.downsample is None else self.downsample(x)
        return torch.relu(out + idn)


class TResNeSt50(tnn.Module):
    def __init__(self, num_classes=10):
        super().__init__()
        self.stem = tnn.Sequential(
            tnn.Conv2d(3, 32, 3, 2, 1, bias=False), tnn.BatchNorm2d(32),
            tnn.ReLU(),
            tnn.Conv2d(32, 32, 3, 1, 1, bias=False), tnn.BatchNorm2d(32),
            tnn.ReLU(),
            tnn.Conv2d(32, 64, 3, 1, 1, bias=False), tnn.BatchNorm2d(64),
            tnn.ReLU(), tnn.MaxPool2d(3, 2, 1))
        blocks, cin = [], 64
        for si, (n, planes) in enumerate(zip((3, 4, 6, 3),
                                             (64, 128, 256, 512))):
            for bi in range(n):
                stride = 2 if (bi == 0 and si > 0) else 1
                blocks.append(TResNeStBlock(cin, planes, stride,
                                            downsample=(bi == 0)))
                cin = planes * 4
        self.blocks = tnn.ModuleList(blocks)
        self.fc = tnn.Linear(cin, num_classes)

    def forward(self, x):
        x = self.stem(x)
        for b in self.blocks:
            x = b(x)
        return self.fc(x.mean(dim=(2, 3)))


def test_resnest50_parity(rng):
    from tlxcv_tpu.models.classification import resnest50

    roundtrip(TResNeSt50(), resnest50(num_classes=10), _x(rng, 64),
              atol=5e-4)


# ---------------------------------------------------------------- peleenet
class TCBR(tnn.Module):
    def __init__(self, cin, cout, k=3, stride=1, act=True):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, k, stride, k // 2, bias=False)
        self.bn = tnn.BatchNorm2d(cout)
        self.act = act

    def forward(self, x):
        x = self.bn(self.conv(x))
        return torch.relu(x) if self.act else x


class TStemBlock(tnn.Module):
    def __init__(self, out=32):
        super().__init__()
        self.c1 = TCBR(3, out, 3, 2)
        self.left = tnn.Sequential(TCBR(out, out // 2, 1),
                                   TCBR(out // 2, out, 3, 2))
        self.fuse = TCBR(out * 2, out, 1)

    def forward(self, x):
        x = self.c1(x)
        return self.fuse(torch.cat([self.left(x),
                                    F.max_pool2d(x, 2, 2)], 1))


class TTwoWayDense(tnn.Module):
    def __init__(self, cin, growth, bw):
        super().__init__()
        mid = growth * bw // 2
        self.a = tnn.Sequential(TCBR(cin, mid, 1), TCBR(mid, growth // 2, 3))
        self.b = tnn.Sequential(TCBR(cin, mid, 1), TCBR(mid, growth // 2, 3),
                                TCBR(growth // 2, growth // 2, 3))

    def forward(self, x):
        return torch.cat([x, self.a(x), self.b(x)], 1)


class TPeleeNet(tnn.Module):
    def __init__(self, num_classes=10, growth=32, block_cfg=(3, 4, 8, 6),
                 bw=(1, 2, 4, 4)):
        super().__init__()
        self.stem = TStemBlock(32)
        blocks, cin = [], 32
        self.pool_at = set()
        for si, (n, w) in enumerate(zip(block_cfg, bw)):
            for _ in range(n):
                blocks.append(TTwoWayDense(cin, growth, w))
                cin += growth
            blocks.append(TCBR(cin, cin, 1))
            if si < len(block_cfg) - 1:
                # placeholder keeps ModuleList indices aligned with the
                # framework model, whose blocks list holds the AvgPool
                blocks.append(tnn.Identity())
                self.pool_at.add(len(blocks) - 1)
        self.blocks = tnn.ModuleList(blocks)
        self.fc = tnn.Linear(cin, num_classes)

    def forward(self, x):
        x = self.stem(x)
        for i, b in enumerate(self.blocks):
            x = F.avg_pool2d(x, 2, 2) if i in self.pool_at else b(x)
        return self.fc(x.mean(dim=(2, 3)))


def test_peleenet_parity(rng):
    from tlxcv_tpu.models.classification import peleenet

    roundtrip(TPeleeNet(), peleenet(num_classes=10), _x(rng, 64), atol=5e-4)


# ----------------------------------------------------------------- hardnet
class THarDBlock(tnn.Module):
    def __init__(self, cin, growth, grmul, n_layers):
        super().__init__()
        self.links, layers, chs = [], [], [cin]
        self.n_layers = n_layers
        for i in range(1, n_layers + 1):
            j = 0
            while i % (2 ** (j + 1)) == 0:
                j += 1
            ch = int(int(growth * (grmul ** j) / 2) * 2)
            links = sorted({i - 2 ** p for p in range(j + 1)
                            if i - 2 ** p >= 0})
            cin_i = sum(chs[l] for l in links)
            layers.append(TCBR(cin_i, ch, 3))
            self.links.append(links)
            chs.append(ch)
        self.layers = tnn.ModuleList(layers)

    def forward(self, x):
        feats = [x]
        for layer, links in zip(self.layers, self.links):
            inp = torch.cat([feats[l] for l in links], 1) \
                if len(links) > 1 else feats[links[0]]
            feats.append(layer(inp))
        outs = [feats[i] for i in range(1, self.n_layers + 1)
                if i == self.n_layers or i % 2 == 1]
        return torch.cat(outs, 1)


class THarDNet68(tnn.Module):
    def __init__(self, num_classes=10):
        super().__init__()
        ch_list, gr = (128, 256, 320, 640), (14, 16, 20, 40)
        n_layers, downsample = (8, 16, 16, 16), (1, 0, 1, 1)
        self.stem = tnn.Sequential(TCBR(3, 32, 3, 2), TCBR(32, 64, 3))
        blocks, cin = [], 64
        self.pool_after = set()
        for i in range(4):
            blk = THarDBlock(cin, gr[i], 1.7, n_layers[i])
            cin = sum(int(int(gr[i] * (1.7 ** _j(k)) / 2) * 2)
                      for k in range(1, n_layers[i] + 1)
                      if k == n_layers[i] or k % 2 == 1)
            blocks.append(blk)
            blocks.append(TCBR(cin, ch_list[i], 1))
            cin = ch_list[i]
            if downsample[i]:
                self.pool_after.add(len(blocks) - 1)
        self.blocks = tnn.ModuleList(blocks)
        self.fc = tnn.Linear(cin, num_classes)

    def forward(self, x):
        x = F.max_pool2d(self.stem(x), 3, 2, 1)
        for i, b in enumerate(self.blocks):
            x = b(x)
            if i in self.pool_after:
                x = F.max_pool2d(x, 2, 2)
        return self.fc(x.mean(dim=(2, 3)))


def _j(i):
    j = 0
    while i % (2 ** (j + 1)) == 0:
        j += 1
    return j


def test_hardnet68_parity(rng):
    from tlxcv_tpu.models.classification import hardnet68

    roundtrip(THarDNet68(), hardnet68(num_classes=10), _x(rng, 64),
              atol=5e-4)
