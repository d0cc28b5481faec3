"""Zoo parity wave 7: mixnet_s (mixed depthwise), dpn68 (dual path),
dla34 (deep layer aggregation), googlenet, squeezenet1_1 torch oracles
(golden battery -> 32 archs).

Reference architectures: tlxcv/models/classification/{mixnet.py, dpn.py,
dla.py, googlenet.py, squeezenet.py}.
"""
import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

from tests.test_parity_zoo import _x, roundtrip

torch.manual_seed(6)


# ------------------------------------------------------------------ mixnet
class TMixedDWConv(tnn.Module):
    def __init__(self, channels, kernel_sizes, stride=1):
        super().__init__()
        n = len(kernel_sizes)
        splits = [channels // n] * n
        splits[0] += channels - sum(splits)
        self.splits = splits
        self.convs = tnn.ModuleList(
            tnn.Conv2d(c, c, k, stride, k // 2, groups=c, bias=False)
            for c, k in zip(splits, kernel_sizes))

    def forward(self, x):
        parts = torch.split(x, self.splits, dim=1)
        return torch.cat([conv(p) for conv, p in zip(self.convs, parts)], 1)


class TMixSE(tnn.Module):
    def __init__(self, ch, reduction):
        super().__init__()
        mid = max(1, ch // reduction)
        self.fc1 = tnn.Conv2d(ch, mid, 1)
        self.fc2 = tnn.Conv2d(mid, ch, 1)

    def forward(self, x):
        s = x.mean(dim=(2, 3), keepdim=True)
        return x * torch.sigmoid(self.fc2(torch.relu(self.fc1(s))))


class TMixBlock(tnn.Module):
    def __init__(self, cin, cout, kernels, expand, stride, se_ratio, act):
        super().__init__()
        mid = cin * expand
        self.use_res = stride == 1 and cin == cout
        self.expand = expand != 1
        if self.expand:
            self.pw1 = tnn.Conv2d(cin, mid, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(mid)
        self.dw = TMixedDWConv(mid, kernels, stride)
        self.bn2 = tnn.BatchNorm2d(mid)
        self.se = TMixSE(mid, int(1 / se_ratio)) if se_ratio else None
        self.pw2 = tnn.Conv2d(mid, cout, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(cout)
        self.act = F.relu if act == "relu" else F.silu

    def forward(self, x):
        out = x
        if self.expand:
            out = self.act(self.bn1(self.pw1(out)))
        out = self.act(self.bn2(self.dw(out)))
        if self.se is not None:
            out = self.se(out)
        out = self.bn3(self.pw2(out))
        return x + out if self.use_res else out


class TMixNetS(tnn.Module):
    def __init__(self, num_classes=10):
        super().__init__()
        from tlxcv_tpu.models.classification.mixnet import _S_CFG

        self.stem = tnn.Sequential(
            tnn.Conv2d(3, 16, 3, 2, 1, bias=False), tnn.BatchNorm2d(16),
            tnn.ReLU())
        self.blocks = tnn.ModuleList(
            TMixBlock(ci, co, ks, e, st, se, act)
            for ci, co, ks, e, st, se, act in _S_CFG)
        self.head = tnn.Sequential(
            tnn.Conv2d(200, 1536, 1, bias=False), tnn.BatchNorm2d(1536),
            tnn.ReLU())
        self.fc = tnn.Linear(1536, num_classes)

    def forward(self, x):
        x = self.stem(x)
        for b in self.blocks:
            x = b(x)
        return self.fc(self.head(x).mean(dim=(2, 3)))


def test_mixnet_s_parity(rng):
    from tlxcv_tpu.models.classification import mixnet_s

    roundtrip(TMixNetS(), mixnet_s(num_classes=10), _x(rng, 64), atol=5e-4)


# --------------------------------------------------------------------- dpn
class TBnActConv(tnn.Module):
    def __init__(self, cin, cout, k, stride=1, groups=1):
        super().__init__()
        self.bn = tnn.BatchNorm2d(cin)
        self.conv = tnn.Conv2d(cin, cout, k, stride, k // 2, groups=groups,
                               bias=False)

    def forward(self, x):
        return self.conv(torch.relu(self.bn(x)))


class TDualPathBlock(tnn.Module):
    def __init__(self, cin, num_1x1_a, num_3x3_b, num_1x1_c, inc, groups,
                 block_type="normal"):
        super().__init__()
        self.num_1x1_c, self.inc = num_1x1_c, inc
        stride = 2 if block_type == "down" else 1
        self.has_proj = block_type in ("proj", "down")
        if self.has_proj:
            self.proj = TBnActConv(cin, num_1x1_c + 2 * inc, 1, stride)
        self.a = TBnActConv(cin, num_1x1_a, 1)
        self.b = TBnActConv(num_1x1_a, num_3x3_b, 3, stride, groups)
        self.c = TBnActConv(num_3x3_b, num_1x1_c + inc, 1)

    def forward(self, x):
        if isinstance(x, tuple):
            res, dense = x
            inp = torch.cat([res, dense], 1)
        else:
            inp, res, dense = x, None, None
        if self.has_proj:
            p = self.proj(inp)
            res_in = p[:, :self.num_1x1_c]
            dense_in = p[:, self.num_1x1_c:]
        else:
            res_in, dense_in = res, dense
        out = self.c(self.b(self.a(inp)))
        res_out = res_in + out[:, :self.num_1x1_c]
        dense_out = torch.cat([dense_in, out[:, self.num_1x1_c:]], 1)
        return res_out, dense_out


class TDPN68(tnn.Module):
    def __init__(self, num_classes=10):
        super().__init__()
        k_r, groups, inc_sec = 128, 32, (16, 32, 32, 64)
        k_sec = (3, 4, 12, 3)
        bw = (64, 128, 256, 512)
        self.stem = tnn.Sequential(
            tnn.Conv2d(3, 10, 3, 2, 1, bias=False), tnn.BatchNorm2d(10),
            tnn.ReLU(), tnn.MaxPool2d(3, 2, 1))
        blocks, cin = [], 10
        for si in range(4):
            r = k_r * bw[si] // 64
            for bi in range(k_sec[si]):
                btype = ("proj" if si == 0 else "down") if bi == 0 \
                    else "normal"
                blocks.append(TDualPathBlock(cin, r, r, bw[si], inc_sec[si],
                                             groups, btype))
                cin = bw[si] + (bi + 3) * inc_sec[si]
        self.blocks = tnn.ModuleList(blocks)
        self.final_bn = tnn.BatchNorm2d(cin)
        self.fc = tnn.Linear(cin, num_classes)

    def forward(self, x):
        out = self.stem(x)
        for b in self.blocks:
            out = b(out)
        out = torch.relu(self.final_bn(torch.cat(out, 1)))
        return self.fc(out.mean(dim=(2, 3)))


def test_dpn68_parity(rng):
    from tlxcv_tpu.models.classification import dpn68

    roundtrip(TDPN68(), dpn68(num_classes=10), _x(rng, 64), atol=5e-4)


# --------------------------------------------------------------------- dla
class TDLABasic(tnn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)

    def forward(self, x, residual=None):
        if residual is None:
            residual = x
        out = torch.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return torch.relu(out + residual)


class TDLARoot(tnn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, 1, bias=False)
        self.bn = tnn.BatchNorm2d(cout)

    def forward(self, children):
        return torch.relu(self.bn(self.conv(torch.cat(children, 1))))


class TDLATree(tnn.Module):
    def __init__(self, levels, cin, cout, stride=1, root_dim=0,
                 level_root=False):
        super().__init__()
        if root_dim == 0:
            root_dim = 2 * cout
        if level_root:
            root_dim += cin
        self.level_root, self.levels, self.stride = level_root, levels, stride
        if levels == 1:
            self.tree1 = TDLABasic(cin, cout, stride)
            self.tree2 = TDLABasic(cout, cout)
            self.root = TDLARoot(root_dim, cout)
        else:
            self.tree1 = TDLATree(levels - 1, cin, cout, stride)
            self.tree2 = TDLATree(levels - 1, cout, cout,
                                  root_dim=root_dim + cout)
            self.root = None
        self.project = None
        if cin != cout:
            self.project = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, bias=False), tnn.BatchNorm2d(cout))

    def forward(self, x, children=None):
        children = [] if children is None else children
        bottom = F.max_pool2d(x, self.stride, self.stride) \
            if self.stride > 1 else x
        residual = self.project(bottom) if self.project else bottom
        if self.level_root:
            children.append(bottom)
        if self.levels == 1:
            x1 = self.tree1(x, residual)
            x2 = self.tree2(x1)
            return self.root([x2, x1] + children)
        x1 = self.tree1(x)
        children.append(x1)
        return self.tree2(x1, children)


class TDLA34(tnn.Module):
    def __init__(self, num_classes=10,
                 levels=(1, 1, 1, 2, 2, 1),
                 channels=(16, 32, 64, 128, 256, 512)):
        super().__init__()
        self.base = tnn.Sequential(
            tnn.Conv2d(3, channels[0], 7, 1, 3, bias=False),
            tnn.BatchNorm2d(channels[0]), tnn.ReLU())
        self.level0 = tnn.Sequential(
            tnn.Conv2d(channels[0], channels[0], 3, 1, 1, bias=False),
            tnn.BatchNorm2d(channels[0]), tnn.ReLU())
        self.level1 = tnn.Sequential(
            tnn.Conv2d(channels[0], channels[1], 3, 2, 1, bias=False),
            tnn.BatchNorm2d(channels[1]), tnn.ReLU())
        self.level2 = TDLATree(levels[2], channels[1], channels[2], 2)
        self.level3 = TDLATree(levels[3], channels[2], channels[3], 2,
                               level_root=True)
        self.level4 = TDLATree(levels[4], channels[3], channels[4], 2,
                               level_root=True)
        self.level5 = TDLATree(levels[5], channels[4], channels[5], 2,
                               level_root=True)
        self.fc = tnn.Linear(channels[5], num_classes)

    def forward(self, x):
        x = self.level1(self.level0(self.base(x)))
        x = self.level5(self.level4(self.level3(self.level2(x))))
        return self.fc(x.mean(dim=(2, 3)))


def test_dla34_parity(rng):
    from tlxcv_tpu.models.classification import dla34

    roundtrip(TDLA34(), dla34(num_classes=10), _x(rng, 64), atol=5e-4)


# --------------------------------------------------------------- googlenet
class TGBasicConv(tnn.Module):
    def __init__(self, cin, cout, k, stride=1, padding=0):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, k, stride, padding, bias=False)
        self.bn = tnn.BatchNorm2d(cout, eps=0.001)

    def forward(self, x):
        return torch.relu(self.bn(self.conv(x)))


class TInception(tnn.Module):
    def __init__(self, cin, c1, c3r, c3, c5r, c5, pp):
        super().__init__()
        self.b1 = TGBasicConv(cin, c1, 1)
        self.b2 = tnn.Sequential(TGBasicConv(cin, c3r, 1),
                                 TGBasicConv(c3r, c3, 3, padding=1))
        self.b3 = tnn.Sequential(TGBasicConv(cin, c5r, 1),
                                 TGBasicConv(c5r, c5, 3, padding=1))
        self.b4 = TGBasicConv(cin, pp, 1)

    def forward(self, x):
        return torch.cat([self.b1(x), self.b2(x), self.b3(x),
                          self.b4(F.max_pool2d(x, 3, 1, 1))], 1)


class TGoogLeNet(tnn.Module):
    def __init__(self, num_classes=10):
        super().__init__()
        self.stem = tnn.Sequential(
            TGBasicConv(3, 64, 7, 2, 3), tnn.MaxPool2d(3, 2, padding=1),
            TGBasicConv(64, 64, 1), TGBasicConv(64, 192, 3, padding=1),
            tnn.MaxPool2d(3, 2, padding=1))
        self.i3a = TInception(192, 64, 96, 128, 16, 32, 32)
        self.i3b = TInception(256, 128, 128, 192, 32, 96, 64)
        self.i4a = TInception(480, 192, 96, 208, 16, 48, 64)
        self.i4b = TInception(512, 160, 112, 224, 24, 64, 64)
        self.i4c = TInception(512, 128, 128, 256, 24, 64, 64)
        self.i4d = TInception(512, 112, 144, 288, 32, 64, 64)
        self.i4e = TInception(528, 256, 160, 320, 32, 128, 128)
        self.i5a = TInception(832, 256, 160, 320, 32, 128, 128)
        self.i5b = TInception(832, 384, 192, 384, 48, 128, 128)
        self.fc = tnn.Linear(1024, num_classes)

    def forward(self, x):
        x = self.stem(x)
        x = F.max_pool2d(self.i3b(self.i3a(x)), 3, 2, padding=1)
        x = self.i4e(self.i4d(self.i4c(self.i4b(self.i4a(x)))))
        x = F.max_pool2d(x, 2, 2)
        x = self.i5b(self.i5a(x))
        return self.fc(x.mean(dim=(2, 3)))


def test_googlenet_parity(rng):
    from tlxcv_tpu.models.classification import googlenet

    roundtrip(TGoogLeNet(), googlenet(num_classes=10), _x(rng, 64),
              atol=5e-4)


# -------------------------------------------------------------- squeezenet
class TFire(tnn.Module):
    def __init__(self, cin, squeeze, e1, e3):
        super().__init__()
        self.squeeze = tnn.Conv2d(cin, squeeze, 1)
        self.expand1 = tnn.Conv2d(squeeze, e1, 1)
        self.expand3 = tnn.Conv2d(squeeze, e3, 3, padding=1)

    def forward(self, x):
        x = torch.relu(self.squeeze(x))
        return torch.cat([torch.relu(self.expand1(x)),
                          torch.relu(self.expand3(x))], 1)


class TSqueezeNet11(tnn.Module):
    def __init__(self, num_classes=10):
        super().__init__()
        self.features = tnn.Sequential(
            tnn.Conv2d(3, 64, 3, 2), tnn.ReLU(), tnn.MaxPool2d(3, 2),
            TFire(64, 16, 64, 64), TFire(128, 16, 64, 64),
            tnn.MaxPool2d(3, 2),
            TFire(128, 32, 128, 128), TFire(256, 32, 128, 128),
            tnn.MaxPool2d(3, 2),
            TFire(256, 48, 192, 192), TFire(384, 48, 192, 192),
            TFire(384, 64, 256, 256), TFire(512, 64, 256, 256))
        self.final_conv = tnn.Conv2d(512, num_classes, 1)

    def forward(self, x):
        x = self.features(x)
        x = torch.relu(self.final_conv(x))
        return x.mean(dim=(2, 3))


def test_squeezenet1_1_parity(rng):
    from tlxcv_tpu.models.classification import squeezenet1_1

    roundtrip(TSqueezeNet11(), squeezenet1_1(num_classes=10), _x(rng, 64),
              atol=5e-4)
