"""Zoo parity wave 10: remote-sensing change detection — SNUNet (ECAM),
STANet (BAM and PAM pyramid attention), DSIFN (VGG16 feature picker +
attention fusion decoder) torch oracles.

These are exactly the architectures VERDICT r1 flagged as re-sketches
and round 2 restored to reference topology
(tlxcv/models/rs/cd/models/{snunet.py, stanet.py, dsifn.py}); the
oracles prove the restored modules compute the reference math.
"""
import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

from tests.test_parity_zoo import _randomize_bn, roundtrip
from tlxcv_tpu.core import pure, split
from tlxcv_tpu.utils.convert import convert_by_order

torch.manual_seed(9)


def roundtrip2(tmodel, model, t1, t2, atol=5e-4, train_outputs=False):
    """Bitemporal-input variant of the parity roundtrip."""
    import jax.numpy as jnp

    tmodel = tmodel.eval()
    _randomize_bn(tmodel)
    unmatched = convert_by_order(
        {k: v.detach().numpy() for k, v in tmodel.state_dict().items()},
        model, source="torch")
    assert not unmatched, unmatched
    with torch.no_grad():
        ref = tmodel(torch.tensor(t1), torch.tensor(t2))
    params, state = split(model)
    out, _ = pure(model)(params, state,
                         jnp.asarray(np.transpose(t1, (0, 2, 3, 1))),
                         jnp.asarray(np.transpose(t2, (0, 2, 3, 1))))
    refs = ref if isinstance(ref, (list, tuple)) else [ref]
    outs = out if isinstance(out, (list, tuple)) else [out]
    assert len(refs) == len(outs)
    for r, o in zip(refs, outs):
        np.testing.assert_allclose(
            np.asarray(o), r.numpy().transpose(0, 2, 3, 1), atol=atol,
            rtol=atol)


def _pair(rng, size, batch=1):
    t1 = rng.normal(size=(batch, 3, size, size)).astype(np.float32)
    t2 = rng.normal(size=(batch, 3, size, size)).astype(np.float32)
    return t1, t2


class TCA(tnn.Module):
    """CBAM channel attention (rs/layers.py ChannelAttention)."""

    def __init__(self, ch, ratio=8):
        super().__init__()
        self.fc1 = tnn.Conv2d(ch, ch // ratio, 1, bias=False)
        self.fc2 = tnn.Conv2d(ch // ratio, ch, 1, bias=False)

    def forward(self, x):
        avg = self.fc2(torch.relu(self.fc1(x.mean(dim=(2, 3),
                                                  keepdim=True))))
        mx = self.fc2(torch.relu(self.fc1(x.amax(dim=(2, 3),
                                                 keepdim=True))))
        return torch.sigmoid(avg + mx)


class TSA(tnn.Module):
    def __init__(self, k=7):
        super().__init__()
        self.conv = tnn.Conv2d(2, 1, k, padding=k // 2, bias=False)

    def forward(self, x):
        avg = x.mean(dim=1, keepdim=True)
        mx = x.amax(dim=1, keepdim=True)
        return torch.sigmoid(self.conv(torch.cat([avg, mx], 1)))


# ------------------------------------------------------------------ snunet
class TNested(tnn.Module):
    def __init__(self, cin, cout, mid):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, mid, 3, 1, 1)
        self.bn1 = tnn.BatchNorm2d(mid)
        self.conv2 = tnn.Conv2d(mid, cout, 3, 1, 1)
        self.bn2 = tnn.BatchNorm2d(cout)

    def forward(self, x):
        x = self.conv1(x)
        identity = x
        x = torch.relu(self.bn1(x))
        x = self.bn2(self.conv2(x))
        return torch.relu(x + identity)


def _tup2(x):
    return F.interpolate(x, scale_factor=2, mode="bilinear",
                         align_corners=True)


class TSNUNet(tnn.Module):
    def __init__(self, num_classes=2, width=8):
        super().__init__()
        f = [width, width * 2, width * 4, width * 8, width * 16]
        self.conv0_0 = TNested(3, f[0], f[0])
        self.conv1_0 = TNested(f[0], f[1], f[1])
        self.conv2_0 = TNested(f[1], f[2], f[2])
        self.conv3_0 = TNested(f[2], f[3], f[3])
        self.conv4_0 = TNested(f[3], f[4], f[4])
        self.conv0_1 = TNested(f[0] * 2 + f[1], f[0], f[0])
        self.conv1_1 = TNested(f[1] * 2 + f[2], f[1], f[1])
        self.conv2_1 = TNested(f[2] * 2 + f[3], f[2], f[2])
        self.conv3_1 = TNested(f[3] * 2 + f[4], f[3], f[3])
        self.conv0_2 = TNested(f[0] * 3 + f[1], f[0], f[0])
        self.conv1_2 = TNested(f[1] * 3 + f[2], f[1], f[1])
        self.conv2_2 = TNested(f[2] * 3 + f[3], f[2], f[2])
        self.conv0_3 = TNested(f[0] * 4 + f[1], f[0], f[0])
        self.conv1_3 = TNested(f[1] * 4 + f[2], f[1], f[1])
        self.conv0_4 = TNested(f[0] * 5 + f[1], f[0], f[0])
        self.ca_intra = TCA(f[0], ratio=4)
        self.ca_inter = TCA(f[0] * 4, ratio=16)
        self.conv_out = tnn.Conv2d(f[0] * 4, num_classes, 1)

    def forward(self, t1, t2):
        pool = lambda v: F.max_pool2d(v, 2, 2)
        x0_0_t1 = self.conv0_0(t1)
        x1_0_t1 = self.conv1_0(pool(x0_0_t1))
        x2_0_t1 = self.conv2_0(pool(x1_0_t1))
        x3_0_t1 = self.conv3_0(pool(x2_0_t1))
        x0_0_t2 = self.conv0_0(t2)
        x1_0_t2 = self.conv1_0(pool(x0_0_t2))
        x2_0_t2 = self.conv2_0(pool(x1_0_t2))
        x3_0_t2 = self.conv3_0(pool(x2_0_t2))
        x4_0_t2 = self.conv4_0(pool(x3_0_t2))
        cat = lambda *xs: torch.cat(xs, 1)
        x0_1 = self.conv0_1(cat(x0_0_t1, x0_0_t2, _tup2(x1_0_t2)))
        x1_1 = self.conv1_1(cat(x1_0_t1, x1_0_t2, _tup2(x2_0_t2)))
        x0_2 = self.conv0_2(cat(x0_0_t1, x0_0_t2, x0_1, _tup2(x1_1)))
        x2_1 = self.conv2_1(cat(x2_0_t1, x2_0_t2, _tup2(x3_0_t2)))
        x1_2 = self.conv1_2(cat(x1_0_t1, x1_0_t2, x1_1, _tup2(x2_1)))
        x0_3 = self.conv0_3(cat(x0_0_t1, x0_0_t2, x0_1, x0_2, _tup2(x1_2)))
        x3_1 = self.conv3_1(cat(x3_0_t1, x3_0_t2, _tup2(x4_0_t2)))
        x2_2 = self.conv2_2(cat(x2_0_t1, x2_0_t2, x2_1, _tup2(x3_1)))
        x1_3 = self.conv1_3(cat(x1_0_t1, x1_0_t2, x1_1, x1_2, _tup2(x2_2)))
        x0_4 = self.conv0_4(cat(x0_0_t1, x0_0_t2, x0_1, x0_2, x0_3,
                                _tup2(x1_3)))
        out = torch.cat([x0_1, x0_2, x0_3, x0_4], 1)
        intra = x0_1 + x0_2 + x0_3 + x0_4
        m_intra = self.ca_intra(intra)
        out = self.ca_inter(out) * (out + m_intra.repeat(1, 4, 1, 1))
        return self.conv_out(out)


def test_snunet_parity(rng):
    from tlxcv_tpu.models.rs import SNUNet

    t1, t2 = _pair(rng, 32)
    roundtrip2(TSNUNet(width=8), SNUNet(num_classes=2, width=8), t1, t2)


# ---------------------------------------------------------- stanet BAM/PAM
class TBasicBlock(tnn.Module):
    def __init__(self, cin, cout, stride=1, downsample=False):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)
        self.downsample = None
        if downsample:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride, bias=False),
                tnn.BatchNorm2d(cout))

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        out = torch.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return torch.relu(out + idn)


class TResNet18Trunk(tnn.Module):
    """resnet18 C2-C5 trunk, strides (2,1,2,2,2) like RSBackbone."""

    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        layers = []
        cin = 64
        for planes, stride in zip((64, 128, 256, 512), (1, 2, 2, 2)):
            blocks = [TBasicBlock(cin, planes, stride,
                                  downsample=(stride != 1 or cin != planes)),
                      TBasicBlock(planes, planes)]
            layers.append(tnn.Sequential(*blocks))
            cin = planes
        self.layer1, self.layer2, self.layer3, self.layer4 = layers

    def forward(self, x):
        x = torch.relu(self.bn1(self.conv1(x)))
        x = F.max_pool2d(x, 3, 2, 1)
        c2 = self.layer1(x)
        c3 = self.layer2(c2)
        c4 = self.layer3(c3)
        c5 = self.layer4(c4)
        return [c2, c3, c4, c5]


class TConv1x1(tnn.Module):
    def __init__(self, cin, cout, norm=False, act=False, k=1, bias=None):
        super().__init__()
        if bias is None:
            bias = not norm
        self.conv = tnn.Conv2d(cin, cout, k, 1, k // 2, bias=bias)
        self.norm = tnn.BatchNorm2d(cout) if norm else None
        self.act = act

    def forward(self, x):
        x = self.conv(x)
        if self.norm is not None:
            x = self.norm(x)
        return torch.relu(x) if self.act else x


class TRSDecoder(tnn.Module):
    def __init__(self, f_ch=64):
        super().__init__()
        self.dr1 = TConv1x1(64, 96, norm=True, act=True)
        self.dr2 = TConv1x1(128, 96, norm=True, act=True)
        self.dr3 = TConv1x1(256, 96, norm=True, act=True)
        self.dr4 = TConv1x1(512, 96, norm=True, act=True)
        self.conv_out = tnn.Sequential(
            TConv1x1(384, 256, norm=True, act=True, k=3),
            TConv1x1(256, f_ch, norm=True, act=True))

    def forward(self, feats):
        f1 = self.dr1(feats[0])
        size = f1.shape[2:]
        up = lambda y: F.interpolate(y, size=size, mode="bilinear",
                                     align_corners=True)
        f2, f3, f4 = (up(self.dr2(feats[1])), up(self.dr3(feats[2])),
                      up(self.dr4(feats[3])))
        return self.conv_out(torch.cat([f1, f2, f3, f4], 1))


class TBAM(tnn.Module):
    def __init__(self, in_ch):
        super().__init__()
        self.key_ch = in_ch // 8
        self.conv_q = TConv1x1(in_ch, self.key_ch)
        self.conv_k = TConv1x1(in_ch, self.key_ch)
        self.conv_v = TConv1x1(in_ch, in_ch)

    def forward(self, x):
        b, c, h, w = x.shape
        n = h * w
        q = self.conv_q(x).reshape(b, self.key_ch, n).transpose(1, 2)
        k = self.conv_k(x).reshape(b, self.key_ch, n).transpose(1, 2)
        v = self.conv_v(x).reshape(b, c, n).transpose(1, 2)
        attn = ((q @ k.transpose(1, 2)) * self.key_ch ** -0.5).softmax(-1)
        out = (attn @ v).transpose(1, 2).reshape(b, c, h, w)
        return out + x


class TPAMBlock(tnn.Module):
    def __init__(self, in_ch, scale):
        super().__init__()
        self.scale = scale
        self.key_ch = in_ch // 8
        self.conv_q = TConv1x1(in_ch, self.key_ch, norm=True)
        self.conv_k = TConv1x1(in_ch, self.key_ch, norm=True)
        self.conv_v = TConv1x1(in_ch, in_ch)

    def _split(self, x):
        b, c, h, w = x.shape
        s = self.scale
        x = x.reshape(b, c, s, h // s, s, w // s)
        x = x.permute(0, 2, 4, 3, 5, 1)  # b, s, s, h/s, w/s, c
        return x.reshape(b * s * s, -1, c)

    def _merge(self, x, b, c, h, w):
        s = self.scale
        x = x.reshape(b, s, s, h // s, w // s, c)
        x = x.permute(0, 5, 1, 3, 2, 4)  # b, c, s, h/s, s, w/s
        return x.reshape(b, c, h, w)

    def forward(self, x):
        b, c, h, w = x.shape
        q = self._split(self.conv_q(x))
        k = self._split(self.conv_k(x))
        v = self._split(self.conv_v(x))
        attn = ((q @ k.transpose(1, 2)) * self.key_ch ** -0.5).softmax(-1)
        return self._merge(attn @ v, b, c, h, w)


class TPAM(tnn.Module):
    def __init__(self, in_ch, scales=(1, 2, 4, 8)):
        super().__init__()
        self.stages = tnn.ModuleList(TPAMBlock(in_ch, s) for s in scales)
        self.conv_out = TConv1x1(in_ch * len(scales), in_ch, bias=False)

    def forward(self, x):
        return self.conv_out(torch.cat([st(x) for st in self.stages], 1))


class TSTANet(tnn.Module):
    def __init__(self, num_classes=2, att="BAM", width=64):
        super().__init__()
        self.trunk = TResNet18Trunk()
        self.decoder = TRSDecoder(width)
        self.att = TBAM(width) if att == "BAM" else TPAM(width)
        self.att_type = att
        self.conv_out = tnn.Sequential(
            TConv1x1(width, width, norm=True, act=True, k=3),
            TConv1x1(width, num_classes, k=3))

    def forward(self, t1, t2):
        f1 = self.decoder(self.trunk(t1))
        f2 = self.decoder(self.trunk(t2))
        b, c, h, w = f1.shape
        x = torch.stack([f1, f2], dim=-1).reshape(b, c, h, 2 * w)
        y = self.att(x).reshape(b, c, h, w, 2)
        f1, f2 = y[..., 0], y[..., 1]
        y = (f1 - f2).abs()
        y = F.interpolate(y, size=t1.shape[2:], mode="bilinear",
                          align_corners=True)
        return self.conv_out(y)


def test_stanet_bam_parity(rng):
    from tlxcv_tpu.models.rs import STANet

    t1, t2 = _pair(rng, 64)
    roundtrip2(TSTANet(att="BAM"), STANet(num_classes=2, att_type="BAM"),
               t1, t2)


def test_stanet_pam_parity(rng):
    from tlxcv_tpu.models.rs import STANet

    t1, t2 = _pair(rng, 64)
    roundtrip2(TSTANet(att="PAM"), STANet(num_classes=2, att_type="PAM"),
               t1, t2)


# ------------------------------------------------------------------- dsifn
class TVGG16Picker(tnn.Module):
    CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512]

    def __init__(self, indices=(3, 8, 15, 22, 29)):
        super().__init__()
        layers, cin = [], 3
        for v in self.CFG:
            if v == "M":
                layers.append(tnn.MaxPool2d(2, 2))
            else:
                layers += [tnn.Conv2d(cin, v, 3, 1, 1), tnn.ReLU()]
                cin = v
        self.features = tnn.Sequential(*layers)
        self.indices = set(indices)

    def forward(self, x):
        picked = []
        for idx, layer in enumerate(self.features):
            x = layer(x)
            if idx in self.indices:
                picked.append(x)
        return picked


class TConvPReLUBN(tnn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, 3, 1, 1)
        self.prelu = tnn.PReLU()
        self.bn = tnn.BatchNorm2d(cout)

    def forward(self, x):
        return self.bn(self.prelu(self.conv(x)))


class TDSIFN(tnn.Module):
    def __init__(self, num_classes=2):
        super().__init__()
        self.encoder = TVGG16Picker()
        self.sa1, self.sa2, self.sa3 = TSA(), TSA(), TSA()
        self.sa4, self.sa5 = TSA(), TSA()
        self.o1_conv1 = TConvPReLUBN(1024, 512)
        self.o1_conv2 = TConvPReLUBN(512, 512)
        self.bn_sa1 = tnn.BatchNorm2d(512)
        self.o1_conv3 = tnn.Conv2d(512, num_classes, 1)
        self.trans_conv1 = tnn.ConvTranspose2d(512, 512, 2, 2)
        self.ca2 = TCA(1536)
        self.o2_conv1 = TConvPReLUBN(1536, 512)
        self.o2_conv2 = TConvPReLUBN(512, 256)
        self.o2_conv3 = TConvPReLUBN(256, 256)
        self.bn_sa2 = tnn.BatchNorm2d(256)
        self.o2_conv4 = tnn.Conv2d(256, num_classes, 1)
        self.trans_conv2 = tnn.ConvTranspose2d(256, 256, 2, 2)
        self.ca3 = TCA(768)
        self.o3_conv1 = TConvPReLUBN(768, 256)
        self.o3_conv2 = TConvPReLUBN(256, 128)
        self.o3_conv3 = TConvPReLUBN(128, 128)
        self.bn_sa3 = tnn.BatchNorm2d(128)
        self.o3_conv4 = tnn.Conv2d(128, num_classes, 1)
        self.trans_conv3 = tnn.ConvTranspose2d(128, 128, 2, 2)
        self.ca4 = TCA(384)
        self.o4_conv1 = TConvPReLUBN(384, 128)
        self.o4_conv2 = TConvPReLUBN(128, 64)
        self.o4_conv3 = TConvPReLUBN(64, 64)
        self.bn_sa4 = tnn.BatchNorm2d(64)
        self.o4_conv4 = tnn.Conv2d(64, num_classes, 1)
        self.trans_conv4 = tnn.ConvTranspose2d(64, 64, 2, 2)
        self.ca5 = TCA(192)
        self.o5_conv1 = TConvPReLUBN(192, 64)
        self.o5_conv2 = TConvPReLUBN(64, 32)
        self.o5_conv3 = TConvPReLUBN(32, 16)
        self.bn_sa5 = tnn.BatchNorm2d(16)
        self.o5_conv4 = tnn.Conv2d(16, num_classes, 1)

    def forward(self, t1, t2):
        t1f = self.encoder(t1)
        t2f = self.encoder(t2)
        x = torch.cat([t1f[4], t2f[4]], 1)
        x = self.o1_conv2(self.o1_conv1(x))
        x = self.bn_sa1(self.sa1(x) * x)
        x = self.trans_conv1(x)
        x = torch.cat([x, t1f[3], t2f[3]], 1)
        x = self.ca2(x) * x
        x = self.o2_conv3(self.o2_conv2(self.o2_conv1(x)))
        x = self.bn_sa2(self.sa2(x) * x)
        x = self.trans_conv2(x)
        x = torch.cat([x, t1f[2], t2f[2]], 1)
        x = self.ca3(x) * x
        x = self.o3_conv3(self.o3_conv2(self.o3_conv1(x)))
        x = self.bn_sa3(self.sa3(x) * x)
        x = self.trans_conv3(x)
        x = torch.cat([x, t1f[1], t2f[1]], 1)
        x = self.ca4(x) * x
        x = self.o4_conv3(self.o4_conv2(self.o4_conv1(x)))
        x = self.bn_sa4(self.sa4(x) * x)
        x = self.trans_conv4(x)
        x = torch.cat([x, t1f[0], t2f[0]], 1)
        x = self.ca5(x) * x
        x = self.o5_conv3(self.o5_conv2(self.o5_conv1(x)))
        x = self.bn_sa5(self.sa5(x) * x)
        return self.o5_conv4(x)


def test_dsifn_parity(rng):
    from tlxcv_tpu.models.rs import DSIFN

    t1, t2 = _pair(rng, 32)
    roundtrip2(TDSIFN(), DSIFN(num_classes=2), t1, t2, atol=1e-3)
