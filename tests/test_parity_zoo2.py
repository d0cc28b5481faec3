"""Zoo parity wave 2: seg / pose / face / rs torch-oracle twins
(VERDICT r1 next-round #3 — one per remaining family: deeplabv3p
(resnet-vd + ASPP), pose HRNet (multi-resolution fusion), BIT (rs
transformer), RetinaFace (FPN+SSH))."""
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

from tlxcv_tpu.core import pure, split
from tlxcv_tpu.utils.convert import convert_by_order

from tests.test_parity_zoo import _randomize_bn, roundtrip, _x

torch.manual_seed(1)


# ------------------------------------------------------------- pose hrnet
class TCBR(tnn.Module):
    def __init__(self, cin, cout, k, stride=1, act=True):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, k, stride, k // 2, bias=False)
        self.bn = tnn.BatchNorm2d(cout)
        self.act = act

    def forward(self, x):
        x = self.bn(self.conv(x))
        return torch.relu(x) if self.act else x


class THRBasic(tnn.Module):
    def __init__(self, cin, cout, stride=1, downsample=False):
        super().__init__()
        self.conv1 = TCBR(cin, cout, 3, stride)
        self.conv2 = TCBR(cout, cout, 3, act=False)
        self.downsample = TCBR(cin, cout, 1, stride, act=False) \
            if downsample else None

    def forward(self, x):
        idn = self.downsample(x) if self.downsample else x
        return torch.relu(self.conv2(self.conv1(x)) + idn)


class THRBottleneck(tnn.Module):
    def __init__(self, cin, planes, downsample=False):
        super().__init__()
        self.conv1 = TCBR(cin, planes, 1)
        self.conv2 = TCBR(planes, planes, 3)
        self.conv3 = TCBR(planes, planes * 4, 1, act=False)
        self.downsample = TCBR(cin, planes * 4, 1, act=False) \
            if downsample else None

    def forward(self, x):
        idn = self.downsample(x) if self.downsample else x
        return torch.relu(self.conv3(self.conv2(self.conv1(x))) + idn)


class TFuse(tnn.Module):
    def __init__(self, channels):
        super().__init__()
        self.n = len(channels)
        self.paths = tnn.ModuleDict()
        for i in range(self.n):
            for j in range(self.n):
                if j > i:
                    self.paths[f"{i}_{j}"] = TCBR(channels[j], channels[i],
                                                  1, act=False)
                elif j < i:
                    convs = []
                    cin = channels[j]
                    for k in range(i - j):
                        last = k == i - j - 1
                        cout = channels[i] if last else channels[j]
                        convs.append(TCBR(cin, cout, 3, 2, act=not last))
                        cin = cout
                    self.paths[f"{i}_{j}"] = tnn.Sequential(*convs)

    def forward(self, xs):
        outs = []
        for i in range(self.n):
            acc = xs[i]
            for j in range(self.n):
                if j == i:
                    continue
                p = self.paths[f"{i}_{j}"](xs[j])
                if j > i:
                    # match ops.image.interpolate bilinear (half-pixel)
                    p = F.interpolate(p, size=xs[i].shape[2:],
                                      mode="bilinear", align_corners=False)
                acc = acc + p
            outs.append(torch.relu(acc))
        return outs


class TTransition(tnn.Module):
    def __init__(self, in_channels, out_channels):
        super().__init__()
        convs = []
        for i, cout in enumerate(out_channels):
            if i < len(in_channels):
                convs.append(TCBR(in_channels[i], cout, 3)
                             if in_channels[i] != cout else tnn.Identity())
            else:
                convs.append(TCBR(in_channels[-1], cout, 3, 2))
        self.convs = tnn.ModuleList(convs)

    def forward(self, xs):
        outs = []
        for i, conv in enumerate(self.convs):
            src = xs[i] if i < len(xs) else xs[-1]
            outs.append(src if isinstance(conv, tnn.Identity) else conv(src))
        return outs


class THRModule(tnn.Module):
    def __init__(self, channels, num_blocks):
        super().__init__()
        self.branches = tnn.ModuleList(
            tnn.Sequential(THRBasic(c, c, downsample=False),
                           *[THRBasic(c, c) for _ in range(b - 1)])
            for c, b in zip(channels, num_blocks))
        self.fuse = TFuse(channels)

    def forward(self, xs):
        return self.fuse([br(x) for br, x in zip(self.branches, xs)])


class TPoseHRNet(tnn.Module):
    def __init__(self, num_joints=4,
                 c2=(8, 16), c3=(8, 16, 32), c4=(8, 16, 32, 64)):
        super().__init__()
        self.conv1 = TCBR(3, 64, 3, 2)
        self.conv2 = TCBR(64, 64, 3, 2)
        c1 = 8
        self.layer1 = tnn.ModuleList([THRBottleneck(64, c1, downsample=True)])
        self.tr1 = TTransition([c1 * 4], c2)
        self.st2 = tnn.ModuleList([THRModule(c2, (1, 1))])
        self.tr2 = TTransition(c2, c3)
        self.st3 = tnn.ModuleList([THRModule(c3, (1, 1, 1))])
        self.tr3 = TTransition(c3, c4)
        self.st4 = tnn.ModuleList([THRModule(c4, (1, 1, 1, 1))])
        self.final_layer = tnn.Conv2d(c4[0], num_joints, 1)

    def forward(self, x):
        x = self.conv2(self.conv1(x))
        for b in self.layer1:
            x = b(x)
        xs = self.tr1([x])
        for m in self.st2:
            xs = m(xs)
        xs = self.tr2(xs)
        for m in self.st3:
            xs = m(xs)
        xs = self.tr3(xs)
        for m in self.st4:
            xs = m(xs)
        return self.final_layer(xs[0])


def test_pose_hrnet_parity(rng):
    from tlxcv_tpu.models.backbones.hrnet import HRNet
    from tlxcv_tpu.models.human_pose_estimation import PoseHighResolutionNet

    bb = HRNet(stage1_num_modules=1, stage1_num_blocks=(1,),
               stage1_num_channels=(8,),
               stage2_num_modules=1, stage2_num_blocks=(1, 1),
               stage2_num_channels=(8, 16),
               stage3_num_modules=1, stage3_num_blocks=(1, 1, 1),
               stage3_num_channels=(8, 16, 32),
               stage4_num_modules=1, stage4_num_blocks=(1, 1, 1, 1),
               stage4_num_channels=(8, 16, 32, 64))
    model = PoseHighResolutionNet(num_joints=4, backbone=bb)
    tmodel = TPoseHRNet()
    x = _x(rng, 64)
    tmodel = tmodel.eval()
    _randomize_bn(tmodel)
    unmatched = convert_by_order(
        {k: v.detach().numpy() for k, v in tmodel.state_dict().items()},
        model, source="torch")
    assert not unmatched
    with torch.no_grad():
        ref = tmodel(torch.tensor(x)).numpy()           # NCHW heatmaps
    params, state = split(model)
    out, _ = pure(model)(params, state,
                         jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.asarray(out),
                               np.transpose(ref, (0, 2, 3, 1)),
                               atol=5e-4, rtol=5e-4)


# ------------------------------------------------------------- deeplabv3p
class TVDConv(tnn.Module):
    def __init__(self, cin, cout, k, stride=1, dilation=1, act=True,
                 avg_first=False):
        super().__init__()
        self.avg = tnn.AvgPool2d(2, 2, 0) if avg_first else None
        self.conv = tnn.Conv2d(cin, cout, k, 1 if avg_first else stride,
                               (k - 1) // 2 * dilation, dilation, bias=False)
        self.bn = tnn.BatchNorm2d(cout)
        self.act = act

    def forward(self, x):
        if self.avg is not None:
            x = self.avg(x)
        x = self.bn(self.conv(x))
        return torch.relu(x) if self.act else x


class TVDBasic(tnn.Module):
    def __init__(self, cin, planes, stride=1, shortcut=True, if_first=False,
                 dilation=1):
        super().__init__()
        self.conv0 = TVDConv(cin, planes, 3, stride=stride, dilation=dilation)
        self.conv1 = TVDConv(planes, planes, 3, act=False)
        self.shortcut = shortcut
        if not shortcut:
            self.short = TVDConv(cin, planes, 1, act=False,
                                 avg_first=not if_first and stride != 1)

    def forward(self, x):
        out = self.conv1(self.conv0(x))
        idn = x if self.shortcut else self.short(x)
        return torch.relu(out + idn)


class TResNet18VD(tnn.Module):
    def __init__(self, output_stride=8):
        super().__init__()
        if output_stride == 8:
            dilations, strides = (1, 1, 2, 4), (1, 2, 1, 1)
        else:
            dilations, strides = (1, 1, 1, 1), (1, 2, 2, 2)
        self.stem = tnn.Sequential(TVDConv(3, 32, 3, stride=2),
                                   TVDConv(32, 32, 3), TVDConv(32, 64, 3))
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        planes = (64, 128, 256, 512)
        stages = []
        cin = 64
        for si, (n, p, s, d) in enumerate(zip((2, 2, 2, 2), planes, strides,
                                              dilations)):
            blocks = []
            for bi in range(n):
                stride = s if bi == 0 else 1
                dd = max(d // 2, 1) if (d > 1 and bi == 0) else d
                blocks.append(TVDBasic(cin, p, stride=stride,
                                       shortcut=bi != 0, if_first=si == 0,
                                       dilation=dd))
                cin = p
            stages.append(tnn.ModuleList(blocks))
        self.stages = tnn.ModuleList(stages)

    def forward(self, x):
        x = self.maxpool(self.stem(x))
        feats = []
        for blocks in self.stages:
            for b in blocks:
                x = b(x)
            feats.append(x)
        return feats


class TConvBNReLU(tnn.Module):
    def __init__(self, cin, cout, k, padding="same", dilation=1, groups=1):
        super().__init__()
        if padding == "same":
            padding = (k - 1) // 2 * dilation
        self.conv = tnn.Conv2d(cin, cout, k, 1, padding, dilation,
                               groups=groups, bias=False)
        self.bn = tnn.BatchNorm2d(cout)

    def forward(self, x):
        return torch.relu(self.bn(self.conv(x)))


class TSepConv(tnn.Module):
    def __init__(self, cin, cout, k, dilation=1):
        super().__init__()
        self.depthwise = TConvBNReLU(cin, cin, k, dilation=dilation,
                                     groups=cin)
        self.pointwise = TConvBNReLU(cin, cout, 1, padding=0)

    def forward(self, x):
        return self.pointwise(self.depthwise(x))


class TASPP(tnn.Module):
    def __init__(self, ratios, cin, cout):
        super().__init__()
        blocks = []
        for r in ratios:
            if r > 1:
                blocks.append(TSepConv(cin, cout, 3, dilation=r))
            else:
                blocks.append(TConvBNReLU(cin, cout, 1))
        self.blocks = tnn.ModuleList(blocks)
        self.global_conv = TConvBNReLU(cin, cout, 1, padding=0)
        self.project = TConvBNReLU(cout * (len(ratios) + 1), cout, 1,
                                   padding=0)

    def forward(self, x):
        outs = [b(x) for b in self.blocks]
        gp = self.global_conv(x.mean(dim=(2, 3), keepdim=True))
        outs.append(gp.expand(-1, -1, x.shape[2], x.shape[3]))
        return self.project(torch.cat(outs, 1))


class TDeepLabV3P(tnn.Module):
    def __init__(self, num_classes=4):
        super().__init__()
        self.backbone = TResNet18VD()
        self.aspp = TASPP((1, 12, 24, 36), 512, 256)
        self.low_conv = TConvBNReLU(64, 48, 1, padding=0)
        self.fuse1 = TSepConv(256 + 48, 256, 3)
        self.fuse2 = TSepConv(256, 256, 3)
        self.classifier = tnn.Conv2d(256, num_classes, 1)

    def forward(self, x):
        feats = self.backbone(x)
        low, high = feats[0], feats[3]
        y = self.aspp(high)
        y = F.interpolate(y, size=low.shape[2:], mode="bilinear",
                          align_corners=False)
        y = torch.cat([y, self.low_conv(low)], 1)
        y = self.classifier(self.fuse2(self.fuse1(y)))
        return F.interpolate(y, size=x.shape[2:], mode="bilinear",
                             align_corners=False)


def test_deeplabv3p_parity(rng):
    from tlxcv_tpu.models.backbones.resnet_vd import resnet18_vd
    from tlxcv_tpu.models.segmentation import DeepLabV3P

    model = DeepLabV3P(num_classes=4, backbone=resnet18_vd(output_stride=8))
    x = _x(rng, 64)
    tmodel = TDeepLabV3P().eval()
    _randomize_bn(tmodel)
    unmatched = convert_by_order(
        {k: v.detach().numpy() for k, v in tmodel.state_dict().items()},
        model, source="torch")
    assert not unmatched
    with torch.no_grad():
        ref = tmodel(torch.tensor(x)).numpy()
    params, state = split(model)
    out, _ = pure(model)(params, state,
                         jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.asarray(out),
                               np.transpose(ref, (0, 2, 3, 1)),
                               atol=5e-4, rtol=5e-4)


# -------------------------------------------------------------------- BIT
class TRes18Feats(tnn.Module):
    """torchvision-topology resnet18 (matches tlxcv_tpu ResNet(depth=18))
    returning the C2..C5 pyramid."""

    def __init__(self):
        super().__init__()
        from tests.test_parity_zoo import TorchResNet50  # noqa: F401
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        cin = 64

        def layer(planes, stride):
            nonlocal cin
            down = None
            if stride != 1 or cin != planes:
                down = tnn.Sequential(
                    tnn.Conv2d(cin, planes, 1, stride, bias=False),
                    tnn.BatchNorm2d(planes))
            blocks = tnn.Sequential(
                TBasic(cin, planes, stride, down), TBasic(planes, planes))
            cin = planes
            return blocks

        self.layer1 = layer(64, 1)
        self.layer2 = layer(128, 2)
        self.layer3 = layer(256, 2)
        self.layer4 = layer(512, 2)

    def forward(self, x):
        x = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
        c2 = self.layer1(x)
        c3 = self.layer2(c2)
        c4 = self.layer3(c3)
        c5 = self.layer4(c4)
        return [c2, c3, c4, c5]


class TBasic(tnn.Module):
    def __init__(self, cin, cout, stride=1, downsample=None):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)
        self.downsample = downsample

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        out = torch.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return torch.relu(out + idn)


class TMHA(tnn.Module):
    """Packed-qkv MHA matching nn.attention.MultiHeadAttention."""

    def __init__(self, dim, heads):
        super().__init__()
        self.heads = heads
        self.hd = dim // heads
        self.qkv = tnn.Linear(dim, dim * 3)
        self.proj = tnn.Linear(dim, dim)

    def forward(self, x):
        b, n, c = x.shape
        qkv = self.qkv(x).reshape(b, n, 3, self.heads, self.hd).permute(
            2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = ((q @ k.transpose(-2, -1)) * self.hd ** -0.5).softmax(-1)
        out = (attn @ v).transpose(1, 2).reshape(b, n, c)
        return self.proj(out)


class TCrossAttn(tnn.Module):
    """Separate q/k/v matching detr.DetrAttention."""

    def __init__(self, dim, heads):
        super().__init__()
        self.heads = heads
        self.hd = dim // heads
        self.q = tnn.Linear(dim, dim)
        self.k = tnn.Linear(dim, dim)
        self.v = tnn.Linear(dim, dim)
        self.out = tnn.Linear(dim, dim)

    def forward(self, q, kv):
        b, n, c = q.shape
        m = kv.shape[1]

        def split(t):
            return t.reshape(b, -1, self.heads, self.hd).transpose(1, 2)

        qq, kk, vv = split(self.q(q)), split(self.k(kv)), split(self.v(kv))
        attn = ((qq @ kk.transpose(-2, -1)) * self.hd ** -0.5).softmax(-1)
        o = (attn @ vv).transpose(1, 2).reshape(b, n, c)
        return self.out(o)


class TBITEnc(tnn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim)
        self.attn = TMHA(dim, heads)
        self.norm2 = tnn.LayerNorm(dim)
        self.fc1 = tnn.Linear(dim, dim * 2)
        self.fc2 = tnn.Linear(dim * 2, dim)

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        return x + self.fc2(F.gelu(self.fc1(self.norm2(x))))


class TBITDec(tnn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim)
        self.attn = TCrossAttn(dim, heads)
        self.norm2 = tnn.LayerNorm(dim)
        self.fc1 = tnn.Linear(dim, dim * 2)
        self.fc2 = tnn.Linear(dim * 2, dim)

    def forward(self, x, m):
        x = x + self.attn(self.norm1(x), m)
        return x + self.fc2(F.gelu(self.fc1(self.norm2(x))))


class TConv3x3BNReLU(tnn.Module):
    def __init__(self, cin, cout, norm=True, act=True):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, 3, 1, 1, bias=not norm)
        self.norm = tnn.BatchNorm2d(cout) if norm else None
        self.act = act

    def forward(self, x):
        x = self.conv(x)
        if self.norm is not None:
            x = self.norm(x)
        return torch.relu(x) if self.act else x


class TBIT(tnn.Module):
    def __init__(self, num_classes=2, token_len=4, dim=16, enc_depth=1,
                 dec_depth=2, heads=8):
        super().__init__()
        self.backbone = TRes18Feats()
        self.conv_squeeze = TConv3x3BNReLU(128, dim)
        self.token_len = token_len
        self.conv_att = tnn.Conv2d(dim, token_len, 1)
        self.encoder = tnn.ModuleList(TBITEnc(dim, heads)
                                      for _ in range(enc_depth))
        self.decoder = tnn.ModuleList(TBITDec(dim, heads)
                                      for _ in range(dec_depth))
        self.head = tnn.Sequential(TConv3x3BNReLU(dim, dim),
                                   TConv3x3BNReLU(dim, num_classes,
                                                  norm=False, act=False))

    def _features(self, x):
        return self.conv_squeeze(self.backbone(x)[1])

    def _tokens(self, x):
        b, c, h, w = x.shape
        att = self.conv_att(x).reshape(b, self.token_len, h * w)
        att = att.transpose(1, 2).softmax(dim=1)       # [b, hw, t]
        feats = x.reshape(b, c, h * w).transpose(1, 2)  # [b, hw, c]
        return torch.einsum("bnt,bnc->btc", att, feats)

    def forward(self, t1, t2):
        x1 = self._features(t1)
        x2 = self._features(t2)
        tokens = torch.cat([self._tokens(x1), self._tokens(x2)], 1)
        for layer in self.encoder:
            tokens = layer(tokens)
        tok1, tok2 = tokens.chunk(2, dim=1)
        b, c, h, w = x1.shape

        def decode(x, tok):
            seq = x.reshape(b, c, h * w).transpose(1, 2)
            for layer in self.decoder:
                seq = layer(seq, tok)
            return seq.transpose(1, 2).reshape(b, c, h, w)

        y1 = decode(x1, tok1)
        y2 = decode(x2, tok2)
        diff = (y1 - y2).abs()
        diff = F.interpolate(diff, size=t1.shape[2:], mode="bilinear",
                             align_corners=False)
        return self.head(diff)


def test_bit_parity(rng):
    from tlxcv_tpu.models import rs

    model = rs.BIT(3, 2, token_len=4, dim=16, enc_depth=1, dec_depth=2)
    tmodel = TBIT().eval()
    _randomize_bn(tmodel)
    unmatched = convert_by_order(
        {k: v.detach().numpy() for k, v in tmodel.state_dict().items()},
        model, source="torch")
    assert not unmatched
    x1 = _x(rng, 64)
    x2 = _x(rng, 64)
    with torch.no_grad():
        ref = tmodel(torch.tensor(x1), torch.tensor(x2)).numpy()
    params, state = split(model)
    out, _ = pure(model)(params, state,
                         jnp.asarray(np.transpose(x1, (0, 2, 3, 1))),
                         jnp.asarray(np.transpose(x2, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.asarray(out),
                               np.transpose(ref, (0, 2, 3, 1)),
                               atol=5e-4, rtol=5e-4)


# -------------------------------------------------------------- retinaface
class TConvUnit(tnn.Module):
    def __init__(self, cin, cout, k, s, act=None):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, k, s, (k - 1) // 2, bias=False)
        self.bn = tnn.BatchNorm2d(cout)
        self.act = act

    def forward(self, x):
        x = self.bn(self.conv(x))
        if self.act == "relu":
            return torch.relu(x)
        if self.act == "lrelu":
            return F.leaky_relu(x, 0.1)
        return x


class TFPNFace(tnn.Module):
    def __init__(self, in_channels, out_ch):
        super().__init__()
        act = "lrelu" if out_ch <= 64 else "relu"
        self.outputs = tnn.ModuleList(
            TConvUnit(c, out_ch, 1, 1, act) for c in in_channels)
        self.merge1 = TConvUnit(out_ch, out_ch, 3, 1, act)
        self.merge2 = TConvUnit(out_ch, out_ch, 3, 1, act)

    def forward(self, feats):
        o1, o2, o3 = [c(f) for c, f in zip(self.outputs, feats)]
        o2 = o2 + F.interpolate(o3, size=o2.shape[2:], mode="nearest")
        o2 = self.merge2(o2)
        o1 = o1 + F.interpolate(o2, size=o1.shape[2:], mode="nearest")
        o1 = self.merge1(o1)
        return o1, o2, o3


class TSSH(tnn.Module):
    def __init__(self, ch, out_ch):
        super().__init__()
        act = "lrelu" if out_ch <= 64 else "relu"
        self.conv_3x3 = TConvUnit(ch, out_ch // 2, 3, 1, None)
        self.conv_5x5_1 = TConvUnit(ch, out_ch // 4, 3, 1, act)
        self.conv_5x5_2 = TConvUnit(out_ch // 4, out_ch // 4, 3, 1, None)
        self.conv_7x7_2 = TConvUnit(out_ch // 4, out_ch // 4, 3, 1, act)
        self.conv_7x7_3 = TConvUnit(out_ch // 4, out_ch // 4, 3, 1, None)

    def forward(self, x):
        c3 = self.conv_3x3(x)
        c51 = self.conv_5x5_1(x)
        c5 = self.conv_5x5_2(c51)
        c7 = self.conv_7x7_3(self.conv_7x7_2(c51))
        return torch.relu(torch.cat([c3, c5, c7], 1))


class THead(tnn.Module):
    def __init__(self, ch, num_anchor, out):
        super().__init__()
        self.conv = tnn.Conv2d(ch, num_anchor * out, 1)
        self.out = out

    def forward(self, x):
        y = self.conv(x).permute(0, 2, 3, 1)
        return y.reshape(y.shape[0], -1, self.out)


class TRes50Feats(tnn.Module):
    def __init__(self):
        super().__init__()
        from tests.test_parity_zoo import TorchResNet50

        r = TorchResNet50(num_classes=1)
        self.conv1, self.bn1, self.maxpool = r.conv1, r.bn1, r.maxpool
        self.layer1, self.layer2 = r.layer1, r.layer2
        self.layer3, self.layer4 = r.layer3, r.layer4

    def forward(self, x):
        x = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
        c2 = self.layer1(x)
        c3 = self.layer2(c2)
        c4 = self.layer3(c3)
        c5 = self.layer4(c4)
        return c3, c4, c5


class TRetinaFace(tnn.Module):
    def __init__(self, out_channel=256):
        super().__init__()
        self.backbone = TRes50Feats()
        self.fpn = TFPNFace((512, 1024, 2048), out_channel)
        self.ssh = tnn.ModuleList(TSSH(out_channel, out_channel)
                                  for _ in range(3))
        self.bboxheads = tnn.ModuleList(THead(out_channel, 2, 4)
                                        for _ in range(3))
        self.landheads = tnn.ModuleList(THead(out_channel, 2, 10)
                                        for _ in range(3))
        self.classheads = tnn.ModuleList(THead(out_channel, 2, 2)
                                         for _ in range(3))

    def forward(self, x):
        feats = self.fpn(self.backbone(x))
        feats = [s(f) for s, f in zip(self.ssh, feats)]
        bbox = torch.cat([h(f) for h, f in zip(self.bboxheads, feats)], 1)
        landm = torch.cat([h(f) for h, f in zip(self.landheads, feats)], 1)
        cls = torch.cat([h(f) for h, f in zip(self.classheads, feats)], 1)
        return bbox, landm, cls.softmax(-1)


def test_retinaface_parity(rng):
    from tlxcv_tpu.models.face_recognition import RetinaFace

    model = RetinaFace(input_size=128)
    tmodel = TRetinaFace().eval()
    _randomize_bn(tmodel)
    unmatched = convert_by_order(
        {k: v.detach().numpy() for k, v in tmodel.state_dict().items()},
        model, source="torch")
    assert not unmatched
    x = _x(rng, 128, batch=1)
    with torch.no_grad():
        rb, rl, rc = tmodel(torch.tensor(x))
    params, state = split(model)
    (b, l, c), _ = pure(model)(params, state,
                               jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    # head-channel ordering: our heads reshape NHWC [b,h,w,A*o]; the twin
    # permutes to match, so outputs align element-for-element
    np.testing.assert_allclose(np.asarray(b), rb.numpy(), atol=5e-4,
                               rtol=5e-4)
    np.testing.assert_allclose(np.asarray(l), rl.numpy(), atol=5e-4,
                               rtol=5e-4)
    np.testing.assert_allclose(np.asarray(c), rc.numpy(), atol=5e-4,
                               rtol=5e-4)
