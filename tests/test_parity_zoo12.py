"""Zoo parity wave 12: segmentation — fast_scnn (PPM), bisenetv2
(gather-expand + BGA), enet (max-pool-argmax / max-unpool pairs) torch
oracles, mirroring the reference's segmentation parity table
(reference README.md:100-105; tlxcv/models/segmentation/{fast_scnn.py,
bisenet.py, enet.py}).
"""
import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

from tests.test_parity_zoo import _x, roundtrip
from tests.test_parity_zoo10 import roundtrip2  # noqa: F401 (same file deps)

torch.manual_seed(11)


def seg_roundtrip(tmodel, model, x, atol=5e-4):
    """Single-input NCHW-in/NCHW-out seg parity."""
    import jax.numpy as jnp

    from tests.test_parity_zoo import _randomize_bn
    from tlxcv_tpu.core import pure, split
    from tlxcv_tpu.utils.convert import convert_by_order

    tmodel = tmodel.eval()
    _randomize_bn(tmodel)
    unmatched = convert_by_order(
        {k: v.detach().numpy() for k, v in tmodel.state_dict().items()},
        model, source="torch")
    assert not unmatched, unmatched
    with torch.no_grad():
        ref = tmodel(torch.tensor(x)).numpy()
    params, state = split(model)
    out, _ = pure(model)(params, state,
                         jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.asarray(out),
                               ref.transpose(0, 2, 3, 1), atol=atol,
                               rtol=atol)


class TConvBNReLU(tnn.Module):
    def __init__(self, cin, cout, k, padding="same", stride=1, dilation=1,
                 groups=1):
        super().__init__()
        if padding == "same":
            padding = (k - 1) // 2 * dilation
        self.conv = tnn.Conv2d(cin, cout, k, stride, padding,
                               dilation=dilation, groups=groups, bias=False)
        self.bn = tnn.BatchNorm2d(cout)

    def forward(self, x):
        return torch.relu(self.bn(self.conv(x)))


class TConvBN(tnn.Module):
    def __init__(self, cin, cout, k, padding="same", stride=1, dilation=1,
                 groups=1):
        super().__init__()
        if padding == "same":
            padding = (k - 1) // 2 * dilation
        self.conv = tnn.Conv2d(cin, cout, k, stride, padding,
                               dilation=dilation, groups=groups, bias=False)
        self.bn = tnn.BatchNorm2d(cout)

    def forward(self, x):
        return self.bn(self.conv(x))


class TDWConvBN(tnn.Module):
    def __init__(self, cin, k, stride=1, dilation=1):
        super().__init__()
        self.conv = TConvBN(cin, cin, k, stride=stride, dilation=dilation,
                            groups=cin)

    def forward(self, x):
        return self.conv(x)


class TSepConvBNReLU(tnn.Module):
    def __init__(self, cin, cout, k, stride=1, dilation=1):
        super().__init__()
        self.depthwise = TConvBNReLU(cin, cin, k, stride=stride,
                                     dilation=dilation, groups=cin)
        self.pointwise = TConvBNReLU(cin, cout, 1, padding=0)

    def forward(self, x):
        return self.pointwise(self.depthwise(x))


# --------------------------------------------------------------- fast_scnn
class TPPModule(tnn.Module):
    def __init__(self, cin, cout, bins=(1, 2, 3, 6)):
        super().__init__()
        inter = cin // len(bins)
        self.bins = bins
        self.stages = tnn.ModuleList(
            TConvBNReLU(cin, inter, 1, padding=0) for _ in bins)
        self.project = TConvBNReLU(cin + inter * len(bins), cout, 3)

    def forward(self, x):
        outs = [x]
        for size, stage in zip(self.bins, self.stages):
            feat = stage(F.adaptive_avg_pool2d(x, size))
            outs.append(F.interpolate(feat, size=x.shape[2:],
                                      mode="bilinear", align_corners=False))
        return self.project(torch.cat(outs, 1))


class TInvBottleneck(tnn.Module):
    def __init__(self, cin, cout, expansion=6, stride=1):
        super().__init__()
        hidden = cin * expansion
        self.use_res = stride == 1 and cin == cout
        self.block = tnn.Sequential(
            TConvBNReLU(cin, hidden, 1, padding=0),
            TDWConvBN(hidden, 3, stride=stride),
            TConvBN(hidden, cout, 1, padding=0))

    def forward(self, x):
        out = self.block(x)
        return x + out if self.use_res else out


class TFastSCNN(tnn.Module):
    def __init__(self, num_classes=6):
        super().__init__()

        class LTD(tnn.Module):
            def __init__(self):
                super().__init__()
                self.conv = TConvBNReLU(3, 32, 3, stride=2)
                self.dsconv1 = TSepConvBNReLU(32, 48, 3, stride=2)
                self.dsconv2 = TSepConvBNReLU(48, 64, 3, stride=2)

            def forward(self, x):
                return self.dsconv2(self.dsconv1(self.conv(x)))

        class GFE(tnn.Module):
            def __init__(self):
                super().__init__()

                def stage(cin, cout, n, stride):
                    blocks = [TInvBottleneck(cin, cout, 6, stride)]
                    blocks += [TInvBottleneck(cout, cout, 6, 1)
                               for _ in range(n - 1)]
                    return tnn.Sequential(*blocks)

                self.bottleneck1 = stage(64, 64, 3, 2)
                self.bottleneck2 = stage(64, 96, 3, 2)
                self.bottleneck3 = stage(96, 128, 3, 1)
                self.ppm = TPPModule(128, 128)

            def forward(self, x):
                return self.ppm(self.bottleneck3(
                    self.bottleneck2(self.bottleneck1(x))))

        class Fusion(tnn.Module):
            def __init__(self):
                super().__init__()
                self.dwconv = TConvBNReLU(128, 128, 3)
                self.low_proj = TConvBN(128, 128, 1, padding=0)
                self.high_proj = TConvBN(64, 128, 1, padding=0)

            def forward(self, high, low):
                low = F.interpolate(low, size=high.shape[2:],
                                    mode="bilinear", align_corners=False)
                low = self.low_proj(self.dwconv(low))
                return torch.relu(self.high_proj(high) + low)

        self.ltd = LTD()
        self.gfe = GFE()
        self.fusion = Fusion()
        self.classifier = tnn.Sequential(
            TSepConvBNReLU(128, 128, 3), TSepConvBNReLU(128, 128, 3),
            tnn.Identity(),  # dropout slot (eval no-op, keeps indices)
            tnn.Conv2d(128, num_classes, 1))

    def forward(self, x):
        high = self.ltd(x)
        low = self.gfe(high)
        fused = self.fusion(high, low)
        return F.interpolate(self.classifier(fused), size=x.shape[2:],
                             mode="bilinear", align_corners=False)


def test_fast_scnn_parity(rng):
    from tlxcv_tpu.models.segmentation import FastSCNN

    seg_roundtrip(TFastSCNN(), FastSCNN(num_classes=6),
                  _x(rng, 192, batch=1))


# --------------------------------------------------------------- bisenetv2
class TStem(tnn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv = TConvBNReLU(cin, cout, 3, stride=2)
        self.left = tnn.Sequential(
            TConvBNReLU(cout, cout // 2, 1, padding=0),
            TConvBNReLU(cout // 2, cout, 3, stride=2))
        self.fuse = TConvBNReLU(cout * 2, cout, 3)

    def forward(self, x):
        x = self.conv(x)
        return self.fuse(torch.cat([self.left(x),
                                    F.max_pool2d(x, 3, 2, 1)], 1))


class TGatherExpand(tnn.Module):
    def __init__(self, cin, cout, stride=1, expand=6):
        super().__init__()
        mid = cin * expand
        self.stride, self.cin, self.cout = stride, cin, cout
        self.conv1 = TConvBNReLU(cin, cin, 3)
        if stride == 2:
            self.dw1 = TDWConvBN(cin, 3, stride=2)
            self.dw_mid = tnn.Sequential(
                tnn.Conv2d(cin, mid, 1, bias=False), tnn.BatchNorm2d(mid))
            self.shortcut = tnn.Sequential(
                TDWConvBN(cin, 3, stride=2), TConvBN(cin, cout, 1,
                                                     padding=0))
            self.dw2 = TDWConvBN(mid, 3)
        else:
            self.dw_mid = tnn.Sequential(
                tnn.Conv2d(cin, mid, 1, bias=False), tnn.BatchNorm2d(mid))
            self.dw2 = TDWConvBN(mid, 3)
        self.proj = TConvBN(mid, cout, 1, padding=0)

    def forward(self, x):
        out = self.conv1(x)
        if self.stride == 2:
            out = self.dw1(out)
        out = self.dw2(torch.relu(self.dw_mid(out)))
        out = self.proj(out)
        res = self.shortcut(x) if self.stride == 2 else x
        if self.stride == 1 and self.cin != self.cout:
            return torch.relu(out)
        return torch.relu(out + res)


class TContextEmbedding(tnn.Module):
    def __init__(self, cin):
        super().__init__()
        self.bn = tnn.BatchNorm2d(cin)
        self.conv1 = TConvBNReLU(cin, cin, 1, padding=0)
        self.conv3 = tnn.Conv2d(cin, cin, 3, 1, 1)

    def forward(self, x):
        gap = x.mean(dim=(2, 3), keepdim=True)
        return self.conv3(self.conv1(self.bn(gap)) + x)


class TSegHead(tnn.Module):
    def __init__(self, cin, mid, num_classes):
        super().__init__()
        self.conv = TConvBNReLU(cin, mid, 3)
        self.cls = tnn.Conv2d(mid, num_classes, 1)

    def forward(self, x):
        return self.cls(self.conv(x))


class TBiSeNetV2(tnn.Module):
    def __init__(self, num_classes=6, lambd=0.25):
        super().__init__()
        c1, c2, c3 = 64, 64, 128
        sb = (int(c1 * lambd), int(c2 * lambd), c3 // 2, c3)

        class Detail(tnn.Module):
            def __init__(self):
                super().__init__()
                self.stage = tnn.Sequential(
                    TConvBNReLU(3, c1, 3, stride=2), TConvBNReLU(c1, c1, 3),
                    TConvBNReLU(c1, c2, 3, stride=2), TConvBNReLU(c2, c2, 3),
                    TConvBNReLU(c2, c2, 3),
                    TConvBNReLU(c2, c3, 3, stride=2), TConvBNReLU(c3, c3, 3),
                    TConvBNReLU(c3, c3, 3))

            def forward(self, x):
                return self.stage(x)

        class Semantic(tnn.Module):
            def __init__(self):
                super().__init__()
                s1, s2, s3, s4 = sb
                self.stem = TStem(3, s1)
                self.stage3 = tnn.Sequential(TGatherExpand(s1, s2, 2),
                                             TGatherExpand(s2, s2))
                self.stage4 = tnn.Sequential(TGatherExpand(s2, s3, 2),
                                             TGatherExpand(s3, s3))
                self.stage5 = tnn.Sequential(
                    TGatherExpand(s3, s4, 2), TGatherExpand(s4, s4),
                    TGatherExpand(s4, s4), TGatherExpand(s4, s4))
                self.ce = TContextEmbedding(s4)

            def forward(self, x):
                s2_ = self.stem(x)
                s3_ = self.stage3(s2_)
                s4_ = self.stage4(s3_)
                return s2_, s3_, s4_, self.ce(self.stage5(s4_))

        class TBGA(tnn.Module):
            def __init__(self, ch=128):
                super().__init__()
                self.db_dw = tnn.Sequential(TDWConvBN(ch, 3),
                                            tnn.Conv2d(ch, ch, 1))
                self.db_down = TConvBN(ch, ch, 3, stride=2)
                self.sb_dw = tnn.Sequential(TDWConvBN(ch, 3),
                                            tnn.Conv2d(ch, ch, 1))
                self.sb_conv = TConvBN(ch, ch, 3)
                self.proj = TConvBN(ch, ch, 3)

            def forward(self, detail, semantic):
                d1 = self.db_dw(detail)
                d2 = F.avg_pool2d(self.db_down(detail), 3, 2, 1,
                                  count_include_pad=False)
                s1 = self.sb_conv(semantic)
                s2 = self.sb_dw(semantic)
                s1_up = F.interpolate(s1, size=detail.shape[2:],
                                      mode="bilinear", align_corners=False)
                left = d1 * torch.sigmoid(s1_up)
                right = d2 * torch.sigmoid(s2)
                right_up = F.interpolate(right, size=detail.shape[2:],
                                         mode="bilinear",
                                         align_corners=False)
                return self.proj(left + right_up)

        self.detail = Detail()
        self.semantic = Semantic()
        self.bga = TBGA(c3)
        self.head = TSegHead(c3, c3, num_classes)
        self.aux_heads = tnn.ModuleList([
            TSegHead(sb[0], c1, num_classes), TSegHead(sb[1], c1, num_classes),
            TSegHead(sb[2], c1, num_classes), TSegHead(sb[3], c1, num_classes)])

    def forward(self, x):
        detail = self.detail(x)
        s2, s3, s4, s5 = self.semantic(x)
        fused = self.bga(detail, s5)
        return F.interpolate(self.head(fused), size=x.shape[2:],
                             mode="bilinear", align_corners=False)


def test_bisenetv2_parity(rng):
    from tlxcv_tpu.models.segmentation import BiSeNetV2

    seg_roundtrip(TBiSeNetV2(), BiSeNetV2(num_classes=6),
                  _x(rng, 64, batch=1))


# -------------------------------------------------------------------- enet
class TENetBottleneck(tnn.Module):
    def __init__(self, cin, cout, internal_ratio=4, kind="regular",
                 dilation=1, kernel_size=3):
        super().__init__()
        mid = cin // internal_ratio
        self.kind, self.cin, self.cout = kind, cin, cout
        stride = 2 if kind == "down" else 1
        self.conv1 = tnn.Conv2d(cin, mid, 2 if kind == "down" else 1,
                                stride, bias=False)
        self.bn1 = tnn.BatchNorm2d(mid)
        if kind == "asymmetric":
            self.conv2a = tnn.Conv2d(mid, mid, (kernel_size, 1), 1,
                                     (kernel_size // 2, 0), bias=False)
            self.bn2a = tnn.BatchNorm2d(mid)
            self.conv2 = tnn.Conv2d(mid, mid, (1, kernel_size), 1,
                                    (0, kernel_size // 2), bias=False)
        elif kind == "up":
            self.conv2 = tnn.ConvTranspose2d(mid, mid, 2, 2, bias=False)
        else:
            self.conv2 = tnn.Conv2d(mid, mid, kernel_size, 1,
                                    dilation * (kernel_size // 2),
                                    dilation=dilation, bias=False)
        self.bn2 = tnn.BatchNorm2d(mid)
        self.conv3 = tnn.Conv2d(mid, cout, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(cout)
        if kind == "up":
            self.main_conv = tnn.Conv2d(cin, cout, 1, bias=False)
            self.main_bn = tnn.BatchNorm2d(cout)

    def forward(self, x, indices=None, output_hw=None):
        out = torch.relu(self.bn1(self.conv1(x)))
        if self.kind == "asymmetric":
            out = torch.relu(self.bn2a(self.conv2a(out)))
        out = torch.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.kind == "down":
            main, idx = F.max_pool2d(x, 2, 2, return_indices=True)
            if self.cout > self.cin:
                main = F.pad(main, (0, 0, 0, 0, 0, self.cout - self.cin))
            return torch.relu(main + out), idx
        if self.kind == "up":
            main = self.main_bn(self.main_conv(x))
            main = F.max_unpool2d(main, indices, 2, 2,
                                  output_size=output_hw)
            return torch.relu(main + out)
        return torch.relu(x + out)


class TENet(tnn.Module):
    def __init__(self, num_classes=6):
        super().__init__()

        class Initial(tnn.Module):
            def __init__(self):
                super().__init__()
                self.conv = tnn.Conv2d(3, 13, 3, 2, 1, bias=False)
                self.bn = tnn.BatchNorm2d(16)

            def forward(self, x):
                out = torch.cat([self.conv(x), F.max_pool2d(x, 2, 2)], 1)
                return torch.relu(self.bn(out))

        B = TENetBottleneck
        self.initial = Initial()
        self.down1 = B(16, 64, kind="down")
        self.s1 = tnn.ModuleList(B(64, 64) for _ in range(4))
        self.down2 = B(64, 128, kind="down")

        def stage23():
            return tnn.ModuleList([
                B(128, 128), B(128, 128, dilation=2, kind="dilated"),
                B(128, 128, kind="asymmetric", kernel_size=5),
                B(128, 128, dilation=4, kind="dilated"),
                B(128, 128), B(128, 128, dilation=8, kind="dilated"),
                B(128, 128, kind="asymmetric", kernel_size=5),
                B(128, 128, dilation=16, kind="dilated")])

        self.s2 = stage23()
        self.s3 = stage23()
        self.up4 = B(128, 64, kind="up")
        self.s4 = tnn.ModuleList([B(64, 64), B(64, 64)])
        self.up5 = B(64, 16, kind="up")
        self.s5 = tnn.ModuleList([B(16, 16)])
        self.final = tnn.ConvTranspose2d(16, num_classes, 3, 2, 1,
                                         output_padding=1)

    def forward(self, x):
        x = self.initial(x)
        hw1 = x.shape[2:]
        x, idx1 = self.down1(x)
        for b in self.s1:
            x = b(x)
        hw2 = x.shape[2:]
        x, idx2 = self.down2(x)
        for b in self.s2:
            x = b(x)
        for b in self.s3:
            x = b(x)
        x = self.up4(x, indices=idx2[:, :64], output_hw=hw2)
        for b in self.s4:
            x = b(x)
        x = self.up5(x, indices=idx1[:, :16], output_hw=hw1)
        for b in self.s5:
            x = b(x)
        return self.final(x)


def test_enet_parity(rng):
    from tlxcv_tpu.models.segmentation import ENet

    seg_roundtrip(TENet(), ENet(num_classes=6), _x(rng, 64, batch=1))


def test_convtranspose_conversion_square(rng):
    """Square torch ConvTranspose2d kernels (in == out) are ambiguous to
    shape-based transposes — the converter must force the IOHW layout
    (the bug wave 12's ENet oracle exposed)."""
    import jax.numpy as jnp

    import tlxcv_tpu.nn as jn
    from tlxcv_tpu.utils.convert import convert_by_order

    for cin, cout, k, s, p, op in [(6, 4, 2, 2, 0, 0), (8, 8, 2, 2, 0, 0),
                                   (8, 8, 3, 2, 1, 1)]:
        t = tnn.ConvTranspose2d(cin, cout, k, s, p, op).eval()
        m = jn.ConvTranspose2d(cin, cout, k, stride=s, padding=p,
                               output_padding=op)
        unmatched = convert_by_order(
            {kk: v.detach().numpy() for kk, v in t.state_dict().items()},
            m, source="torch")
        assert not unmatched
        x = rng.normal(size=(1, cin, 5, 5)).astype(np.float32)
        with torch.no_grad():
            ref = t(torch.tensor(x)).numpy()
        out = m(jnp.asarray(x.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(np.asarray(out),
                                   ref.transpose(0, 2, 3, 1), atol=1e-5)
