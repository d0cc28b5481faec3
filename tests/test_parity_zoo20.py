"""Zoo parity wave 20: PPYOLOE-s torch oracle — CSPResNet (RepVGG
blocks + effective SE), CustomCSPPAN (SPP + CSP stages), and the
ESE-attention head's raw outputs (class probabilities + DFL regression
distributions) matched end-to-end (reference
tlxcv/models/detection/ppyoloe.py).
"""
import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

from tlxcv_tpu.core import split
from tlxcv_tpu.utils.convert import convert_by_order

torch.manual_seed(19)


class TConvBN(tnn.Module):
    def __init__(self, cin, cout, k=3, stride=1, groups=1, padding=0,
                 act="swish"):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, k, stride, padding, groups=groups,
                               bias=False)
        self.bn = tnn.BatchNorm2d(cout)
        self.act = act

    def forward(self, x):
        x = self.bn(self.conv(x))
        if self.act == "swish":
            return F.silu(x)
        if self.act == "relu":
            return torch.relu(x)
        return x


class TRepVgg(tnn.Module):
    def __init__(self, cin, cout, act="relu"):
        super().__init__()
        self.conv1 = TConvBN(cin, cout, 3, padding=1, act=None)
        self.conv2 = TConvBN(cin, cout, 1, padding=0, act=None)
        self.act = act

    def forward(self, x):
        y = self.conv1(x) + self.conv2(x)
        return F.silu(y) if self.act == "swish" else torch.relu(y)


class TBasic(tnn.Module):
    def __init__(self, cin, cout, act="relu", shortcut=True):
        super().__init__()
        self.conv1 = TConvBN(cin, cout, 3, padding=1, act=act)
        self.conv2 = TRepVgg(cout, cout, act=act)
        self.shortcut = shortcut

    def forward(self, x):
        y = self.conv2(self.conv1(x))
        return x + y if self.shortcut else y


class TESE(tnn.Module):
    def __init__(self, ch):
        super().__init__()
        self.fc = tnn.Conv2d(ch, ch, 1)

    def forward(self, x):
        se = x.mean(dim=(2, 3), keepdim=True)
        return x * F.hardsigmoid(self.fc(se))


class TCSPResStage(tnn.Module):
    def __init__(self, cin, cout, n, act="relu"):
        super().__init__()
        mid = (cin + cout) // 2
        self.conv_down = TConvBN(cin, mid, 3, 2, padding=1, act=act)
        self.conv1 = TConvBN(mid, mid // 2, 1, act=act)
        self.conv2 = TConvBN(mid, mid // 2, 1, act=act)
        self.blocks = tnn.Sequential(*[
            TBasic(mid // 2, mid // 2, act=act) for _ in range(n)])
        self.attn = TESE(mid)
        self.conv3 = TConvBN(mid, cout, 1, act=act)

    def forward(self, x):
        x = self.conv_down(x)
        y = torch.cat([self.conv1(x), self.blocks(self.conv2(x))], 1)
        return self.conv3(self.attn(y))


class TCSPResNet(tnn.Module):
    def __init__(self, layers=(1, 2, 2, 1),
                 channels=(32, 64, 128, 256, 512), act="swish",
                 return_idx=(1, 2, 3)):
        super().__init__()
        c0 = channels[0]
        self.stem = tnn.Sequential(
            TConvBN(3, c0 // 2, 3, 2, padding=1, act=act),
            TConvBN(c0 // 2, c0 // 2, 3, 1, padding=1, act=act),
            TConvBN(c0 // 2, c0, 3, 1, padding=1, act=act))
        self.stages = tnn.ModuleList(
            TCSPResStage(channels[i], channels[i + 1], layers[i], act=act)
            for i in range(4))
        self.return_idx = return_idx

    def forward(self, x):
        x = self.stem(x)
        outs = []
        for i, st in enumerate(self.stages):
            x = st(x)
            if i in self.return_idx:
                outs.append(x)
        return outs


class TSPP(tnn.Module):
    def __init__(self, cin, cout, k, act="swish"):
        super().__init__()
        self.conv = TConvBN(cin, cout, k, padding=k // 2, act=act)

    def forward(self, x):
        outs = [x] + [F.max_pool2d(x, ps, 1, ps // 2) for ps in (5, 9, 13)]
        return self.conv(torch.cat(outs, 1))


class TCSPStage(tnn.Module):
    def __init__(self, cin, cout, n, act="swish", spp=False):
        super().__init__()
        mid = cout // 2
        self.conv1 = TConvBN(cin, mid, 1, act=act)
        self.conv2 = TConvBN(cin, mid, 1, act=act)
        convs = []
        for i in range(n):
            convs.append(TBasic(mid, mid, act=act, shortcut=False))
            if i == (n - 1) // 2 and spp:
                convs.append(TSPP(mid * 4, mid, 1, act=act))
        self.convs = tnn.ModuleList(convs)
        self.conv3 = TConvBN(mid * 2, cout, 1, act=act)

    def forward(self, x):
        y1 = self.conv1(x)
        y2 = self.conv2(x)
        for c in self.convs:
            y2 = c(y2)
        return self.conv3(torch.cat([y1, y2], 1))


class TCSPPAN(tnn.Module):
    def __init__(self, in_channels=(128, 256, 512),
                 out_channels=(384, 192, 96), act="swish", block_num=1):
        super().__init__()
        in_channels = list(in_channels[::-1])
        fpn_stages, fpn_routes, fpn_out, ch_pre = [], [], [], 0
        for i, ch_in in enumerate(in_channels):
            if i > 0:
                ch_in += ch_pre // 2
            fpn_stages.append(tnn.Sequential(
                TCSPStage(ch_in, out_channels[i], block_num, act=act,
                          spp=(i == 0))))
            if i < len(in_channels) - 1:
                fpn_routes.append(TConvBN(out_channels[i],
                                          out_channels[i] // 2, 1, act=act))
            ch_pre = out_channels[i]
            fpn_out.append(out_channels[i])
        self.fpn_stages = tnn.ModuleList(fpn_stages)
        self.fpn_routes = tnn.ModuleList(fpn_routes)
        pan_out = [fpn_out[-1]]
        pan_stages, pan_routes = [], []
        for i in reversed(range(len(in_channels) - 1)):
            pan_routes.append(TConvBN(pan_out[-1], pan_out[-1], 3, 2,
                                      padding=1, act=act))
            pan_stages.append(TCSPStage(pan_out[-1] + fpn_out[i],
                                        fpn_out[i], block_num, act=act))
            pan_out.append(fpn_out[i])
        self.pan_stages = tnn.ModuleList(pan_stages)
        self.pan_routes = tnn.ModuleList(pan_routes)

    def forward(self, feats):
        feats = feats[::-1]
        fpn_feats, route = [], None
        for i, feat in enumerate(feats):
            if i > 0:
                feat = torch.cat([route, feat], 1)
            feat = self.fpn_stages[i](feat)
            fpn_feats.append(feat)
            if i < len(feats) - 1:
                route = self.fpn_routes[i](feat)
                route = F.interpolate(route, scale_factor=2, mode="nearest")
        pan_feats = [fpn_feats[-1]]
        route = fpn_feats[-1]
        for i in reversed(range(len(feats) - 1)):
            block = self.pan_stages[len(feats) - 2 - i]
            down = self.pan_routes[len(feats) - 2 - i](route)
            route = block(torch.cat([down, fpn_feats[i]], 1))
            pan_feats.append(route)
        return pan_feats[::-1]


class TESEAttn(tnn.Module):
    def __init__(self, ch, act="swish"):
        super().__init__()
        self.fc = tnn.Conv2d(ch, ch, 1)
        self.conv = TConvBN(ch, ch, 1, act=act)

    def forward(self, feat, avg):
        return self.conv(feat * torch.sigmoid(self.fc(avg)))


class TPPYOLOEHead(tnn.Module):
    def __init__(self, in_channels=(384, 192, 96), num_classes=4,
                 reg_max=16):
        super().__init__()
        self.num_classes, self.reg_max = num_classes, reg_max
        self.stem_cls = tnn.ModuleList(TESEAttn(c) for c in in_channels)
        self.stem_reg = tnn.ModuleList(TESEAttn(c) for c in in_channels)
        self.pred_cls = tnn.ModuleList(
            tnn.Conv2d(c, num_classes, 3, 1, 1) for c in in_channels)
        self.pred_reg = tnn.ModuleList(
            tnn.Conv2d(c, 4 * (reg_max + 1), 3, 1, 1) for c in in_channels)

    def forward(self, feats):
        cls_list, reg_list = [], []
        for i, feat in enumerate(feats):
            b = feat.shape[0]
            avg = feat.mean(dim=(2, 3), keepdim=True)
            cls_logit = self.pred_cls[i](self.stem_cls[i](feat, avg) + feat)
            reg_dist = self.pred_reg[i](self.stem_reg[i](feat, avg))
            # NHWC flatten order to match the framework's reshape
            cls_list.append(cls_logit.sigmoid().permute(0, 2, 3, 1)
                            .reshape(b, -1, self.num_classes))
            reg_list.append(reg_dist.permute(0, 2, 3, 1)
                            .reshape(b, -1, 4 * (self.reg_max + 1)))
        return torch.cat(cls_list, 1), torch.cat(reg_list, 1)


class TPPYOLOE(tnn.Module):
    def __init__(self, num_classes=4):
        super().__init__()
        self.backbone = TCSPResNet()
        self.neck = TCSPPAN()
        self.yolo_head = TPPYOLOEHead(num_classes=num_classes)

    def forward(self, x):
        return self.yolo_head(self.neck(self.backbone(x)))


def test_ppyoloe_s_parity(rng):
    from tlxcv_tpu.models.detection import ppyoloe

    tm = TPPYOLOE().eval()
    from tests.test_parity_zoo import _randomize_bn

    _randomize_bn(tm)
    model = ppyoloe("ppyoloe_s", num_classes=4)
    unmatched = convert_by_order(
        {k: v.detach().numpy() for k, v in tm.state_dict().items()},
        model, source="torch")
    assert not unmatched, unmatched
    x = rng.normal(size=(1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref_cls, ref_reg = tm(torch.tensor(x))
    import jax.numpy as jnp

    split(model)  # materialize
    cls, reg, _ = model.yolo_head(model.neck(model.backbone(
        jnp.asarray(x.transpose(0, 2, 3, 1)))))
    np.testing.assert_allclose(np.asarray(cls), ref_cls.numpy(), atol=1e-3,
                               rtol=1e-3)
    np.testing.assert_allclose(np.asarray(reg), ref_reg.numpy(), atol=1e-3,
                               rtol=1e-3)
