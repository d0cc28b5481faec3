"""Zoo parity wave 4: ghostnet, res2net, regnety (SE), van torch oracles
(golden battery -> 19 archs)."""
import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

from tests.test_parity_zoo import _x, roundtrip

torch.manual_seed(3)


# ---------------------------------------------------------------- ghostnet
class TGhostModule(tnn.Module):
    def __init__(self, cin, cout, k=1, ratio=2, dw_size=3, stride=1,
                 act=True):
        super().__init__()
        import math

        init_ch = math.ceil(cout / ratio)
        cheap_ch = init_ch * (ratio - 1)
        self.primary = tnn.Sequential(
            tnn.Conv2d(cin, init_ch, k, stride, k // 2, bias=False),
            tnn.BatchNorm2d(init_ch), tnn.ReLU() if act else tnn.Identity())
        self.cheap = tnn.Sequential(
            tnn.Conv2d(init_ch, cheap_ch, dw_size, 1, dw_size // 2,
                       groups=init_ch, bias=False),
            tnn.BatchNorm2d(cheap_ch), tnn.ReLU() if act else tnn.Identity())
        self.cout = cout

    def forward(self, x):
        x1 = self.primary(x)
        x2 = self.cheap(x1)
        return torch.cat([x1, x2], 1)[:, :self.cout]


class TGhostSE(tnn.Module):
    def __init__(self, ch, ratio=4):
        super().__init__()
        from tlxcv_tpu.models.classification.utils import make_divisible

        mid = make_divisible(ch / ratio, 4)
        self.fc1 = tnn.Conv2d(ch, mid, 1)
        self.fc2 = tnn.Conv2d(mid, ch, 1)

    def forward(self, x):
        s = x.mean(dim=(2, 3), keepdim=True)
        s = torch.relu(self.fc1(s))
        return x * torch.clamp(self.fc2(s) + 3, 0, 6) / 6


class TGhostBottleneck(tnn.Module):
    def __init__(self, cin, mid, cout, k, stride, use_se):
        super().__init__()
        self.ghost1 = TGhostModule(cin, mid)
        self.stride = stride
        if stride > 1:
            self.dw = tnn.Conv2d(mid, mid, k, stride, k // 2, groups=mid,
                                 bias=False)
            self.dw_bn = tnn.BatchNorm2d(mid)
        self.se = TGhostSE(mid) if use_se else None
        self.ghost2 = TGhostModule(mid, cout, act=False)
        self.shortcut = None
        if cin != cout or stride != 1:
            self.shortcut = tnn.Sequential(
                tnn.Conv2d(cin, cin, k, stride, k // 2, groups=cin,
                           bias=False), tnn.BatchNorm2d(cin),
                tnn.Conv2d(cin, cout, 1, bias=False), tnn.BatchNorm2d(cout))

    def forward(self, x):
        out = self.ghost1(x)
        if self.stride > 1:
            out = self.dw_bn(self.dw(out))
        if self.se is not None:
            out = self.se(out)
        out = self.ghost2(out)
        sc = x if self.shortcut is None else self.shortcut(x)
        return out + sc


class TGhostNet(tnn.Module):
    CFG = [(3, 16, 16, 0, 1), (3, 48, 24, 0, 2), (3, 72, 24, 0, 1),
           (5, 72, 40, 1, 2), (5, 120, 40, 1, 1), (3, 240, 80, 0, 2),
           (3, 200, 80, 0, 1), (3, 184, 80, 0, 1), (3, 184, 80, 0, 1),
           (3, 480, 112, 1, 1), (3, 672, 112, 1, 1), (5, 672, 160, 1, 2),
           (5, 960, 160, 0, 1), (5, 960, 160, 1, 1), (5, 960, 160, 0, 1),
           (5, 960, 160, 1, 1)]

    def __init__(self, num_classes=10):
        super().__init__()
        self.stem = tnn.Sequential(
            tnn.Conv2d(3, 16, 3, 2, 1, bias=False), tnn.BatchNorm2d(16),
            tnn.ReLU())
        blocks, cin = [], 16
        for k, exp, out, se, stride in self.CFG:
            blocks.append(TGhostBottleneck(cin, exp, out, k, stride, se))
            cin = out
        self.blocks = tnn.ModuleList(blocks)
        self.head_conv = tnn.Sequential(
            tnn.Conv2d(cin, 960, 1, bias=False), tnn.BatchNorm2d(960),
            tnn.ReLU())
        self.conv_last = tnn.Conv2d(960, 1280, 1)
        self.fc = tnn.Linear(1280, num_classes)

    def forward(self, x):
        x = self.stem(x)
        for b in self.blocks:
            x = b(x)
        x = self.head_conv(x).mean(dim=(2, 3), keepdim=True)
        x = torch.relu(self.conv_last(x))
        return self.fc(x[:, :, 0, 0])


def test_ghostnet_parity(rng):
    from tlxcv_tpu.models.classification import ghostnet

    roundtrip(TGhostNet(), ghostnet(num_classes=10), _x(rng, 64), atol=5e-4)


# ---------------------------------------------------------------- res2net
class TCBR(tnn.Module):
    def __init__(self, cin, cout, k, stride=1, act=True):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, k, stride, k // 2, bias=False)
        self.bn = tnn.BatchNorm2d(cout)
        self.act = act

    def forward(self, x):
        x = self.bn(self.conv(x))
        return torch.relu(x) if self.act else x


class TBottle2neck(tnn.Module):
    def __init__(self, cin, planes, stride=1, downsample=False,
                 base_width=26, scale=4):
        super().__init__()
        width = int(planes * (base_width / 64.0)) * scale
        self.scale, self.stride = scale, stride
        self.conv1 = TCBR(cin, width, 1)
        self.convs = tnn.ModuleList(
            TCBR(width // scale, width // scale, 3, stride)
            for _ in range(scale - 1))
        # exclude-pad averaging (paddle exclusive=True — what the
        # reference models and our AvgPool2d implement)
        self.pool = tnn.AvgPool2d(3, stride, 1, count_include_pad=False) \
            if stride > 1 else None
        self.conv3 = TCBR(width, planes * 4, 1, act=False)
        self.downsample = TCBR(cin, planes * 4, 1, stride, act=False) \
            if downsample else None

    def forward(self, x):
        out = self.conv1(x)
        sp = out.chunk(self.scale, dim=1)
        outs, prev = [], None
        for i, conv in enumerate(self.convs):
            s = sp[i] if (i == 0 or self.stride > 1) else sp[i] + prev
            prev = conv(s)
            outs.append(prev)
        last = sp[-1] if self.stride == 1 else self.pool(sp[-1])
        outs.append(last)
        out = self.conv3(torch.cat(outs, 1))
        idn = x if self.downsample is None else self.downsample(x)
        return torch.relu(out + idn)


class TRes2Net50(tnn.Module):
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
                blocks.append(TBottle2neck(cin, planes, stride,
                                           downsample=(bi == 0)))
                cin = planes * 4
        self.blocks = tnn.ModuleList(blocks)
        self.fc = tnn.Linear(cin, num_classes)

    def forward(self, x):
        x = self.stem(x)
        for b in self.blocks:
            x = b(x)
        return self.fc(x.mean(dim=(2, 3)))


def test_res2net50_parity(rng):
    from tlxcv_tpu.models.classification import res2net50_26w_4s

    roundtrip(TRes2Net50(), res2net50_26w_4s(num_classes=10), _x(rng, 64),
              atol=5e-4)


# ----------------------------------------------------------------- regnety
class TRegSE(tnn.Module):
    def __init__(self, ch, se_ch):
        super().__init__()
        self.fc1 = tnn.Conv2d(ch, se_ch, 1)
        self.fc2 = tnn.Conv2d(se_ch, ch, 1)

    def forward(self, x):
        s = x.mean(dim=(2, 3), keepdim=True)
        return x * torch.sigmoid(self.fc2(torch.relu(self.fc1(s))))


class TRegBottleneck(tnn.Module):
    def __init__(self, cin, cout, stride, group_width, se_ratio):
        super().__init__()
        groups = cout // group_width
        self.a = tnn.Sequential(tnn.Conv2d(cin, cout, 1, bias=False),
                                tnn.BatchNorm2d(cout), tnn.ReLU())
        self.b = tnn.Sequential(
            tnn.Conv2d(cout, cout, 3, stride, 1, groups=groups, bias=False),
            tnn.BatchNorm2d(cout), tnn.ReLU())
        self.se = TRegSE(cout, int(cin * se_ratio)) if se_ratio > 0 else None
        self.c = tnn.Sequential(tnn.Conv2d(cout, cout, 1, bias=False),
                                tnn.BatchNorm2d(cout))
        self.proj = None
        if cin != cout or stride != 1:
            self.proj = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride, bias=False),
                tnn.BatchNorm2d(cout))

    def forward(self, x):
        out = self.b(self.a(x))
        if self.se is not None:
            out = self.se(out)
        out = self.c(out)
        sc = x if self.proj is None else self.proj(x)
        return torch.relu(out + sc)


class TRegNetY4GF(tnn.Module):
    def __init__(self, num_classes=10):
        super().__init__()
        from tlxcv_tpu.models.classification.regnet import _generate_widths

        widths, counts = _generate_widths(31.41, 96, 2.24, 22)
        self.stem = tnn.Sequential(
            tnn.Conv2d(3, 32, 3, 2, 1, bias=False), tnn.BatchNorm2d(32),
            tnn.ReLU())
        blocks, cin = [], 32
        for w, n in zip(widths, counts):
            gw = min(64, w)
            w = int(round(w / gw) * gw)
            for i in range(n):
                blocks.append(TRegBottleneck(cin, w, 2 if i == 0 else 1, gw,
                                             0.25))
                cin = w
        self.blocks = tnn.ModuleList(blocks)
        self.fc = tnn.Linear(cin, num_classes)

    def forward(self, x):
        x = self.stem(x)
        for b in self.blocks:
            x = b(x)
        return self.fc(x.mean(dim=(2, 3)))


def test_regnety_parity(rng):
    from tlxcv_tpu.models.classification import regnety_4gf

    roundtrip(TRegNetY4GF(), regnety_4gf(num_classes=10), _x(rng, 64),
              atol=5e-4)


# -------------------------------------------------------------------- van
class TLKA(tnn.Module):
    def __init__(self, dim):
        super().__init__()
        self.dw = tnn.Conv2d(dim, dim, 5, padding=2, groups=dim)
        self.dwd = tnn.Conv2d(dim, dim, 7, padding=9, dilation=3, groups=dim)
        self.pw = tnn.Conv2d(dim, dim, 1)

    def forward(self, x):
        return x * self.pw(self.dwd(self.dw(x)))


class TVANAttention(tnn.Module):
    def __init__(self, dim):
        super().__init__()
        self.proj1 = tnn.Conv2d(dim, dim, 1)
        self.lka = TLKA(dim)
        self.proj2 = tnn.Conv2d(dim, dim, 1)

    def forward(self, x):
        return self.proj2(self.lka(F.gelu(self.proj1(x))))


class TVANMLP(tnn.Module):
    def __init__(self, dim, ratio=4):
        super().__init__()
        hidden = dim * ratio
        self.fc1 = tnn.Conv2d(dim, hidden, 1)
        self.dw = tnn.Conv2d(hidden, hidden, 3, padding=1, groups=hidden)
        self.fc2 = tnn.Conv2d(hidden, dim, 1)

    def forward(self, x):
        return self.fc2(F.gelu(self.dw(self.fc1(x))))


class TVANBlock(tnn.Module):
    def __init__(self, dim, ls_init=1e-2):
        super().__init__()
        self.norm1 = tnn.BatchNorm2d(dim)
        self.attn = TVANAttention(dim)
        self.norm2 = tnn.BatchNorm2d(dim)
        self.mlp = TVANMLP(dim)
        self.ls1 = tnn.Parameter(torch.full((dim,), ls_init))
        self.ls2 = tnn.Parameter(torch.full((dim,), ls_init))

    def forward(self, x):
        x = x + self.ls1.view(-1, 1, 1) * self.attn(self.norm1(x))
        return x + self.ls2.view(-1, 1, 1) * self.mlp(self.norm2(x))


class TVANB0(tnn.Module):
    def __init__(self, num_classes=10, dims=(32, 64, 160, 256),
                 depths=(3, 3, 5, 2)):
        super().__init__()
        pes, stages, norms = [], [], []
        cin = 3
        for i, (dim, depth) in enumerate(zip(dims, depths)):
            k, s = (7, 4) if i == 0 else (3, 2)
            pes.append(tnn.Sequential(
                tnn.Conv2d(cin, dim, k, s, k // 2), tnn.BatchNorm2d(dim)))
            stages.append(tnn.ModuleList(TVANBlock(dim)
                                         for _ in range(depth)))
            norms.append(tnn.LayerNorm(dim))
            cin = dim
        self.patch_embeds = tnn.ModuleList(pes)
        self.stages = tnn.ModuleList(stages)
        self.norms = tnn.ModuleList(norms)
        self.head = tnn.Linear(dims[-1], num_classes)

    def forward(self, x):
        for pe, blocks, norm in zip(self.patch_embeds, self.stages,
                                    self.norms):
            x = pe(x)
            for blk in blocks:
                x = blk(x)
            # channels-last LayerNorm, back to NCHW
            x = norm(x.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)
        return self.head(x.mean(dim=(2, 3)))


def test_van_b0_parity(rng):
    from tlxcv_tpu.models.classification import van_b0

    roundtrip(TVANB0(), van_b0(num_classes=10), _x(rng, 64), atol=5e-4)
