"""Zoo parity wave 13: fastfcn / encnet (reference-faithful EncModule:
encoding projection, BN over codes, residual channel gating, se head)
and FCN-over-HRNet torch oracles — completing the reference's
segmentation parity table (reference README.md:100-105).
"""
import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

from tests.test_parity_zoo import _x
from tests.test_parity_zoo2 import (TCBR, THRBottleneck, THRModule,
                                    TResNet18VD, TTransition)
from tests.test_parity_zoo12 import TConvBNReLU, TSepConvBNReLU, seg_roundtrip

torch.manual_seed(12)


# --------------------------------------------------------- encoding module
class TEncoding(tnn.Module):
    def __init__(self, channels, num_codes=32):
        super().__init__()
        std = 1.0 / ((num_codes * channels) ** 0.5)
        self.codewords = tnn.Parameter(
            torch.empty(num_codes, channels).uniform_(-std, std))
        self.scale = tnn.Parameter(torch.empty(num_codes).uniform_(-1, 0))

    def forward(self, x):  # [N, C, H, W] -> [N, K, C]
        b, c, h, w = x.shape
        flat = x.reshape(b, c, h * w).transpose(1, 2)
        resid = flat.unsqueeze(2) - self.codewords[None, None]
        d2 = (resid ** 2).sum(-1)
        assign = (self.scale * d2).softmax(-1)
        return (assign.unsqueeze(-1) * resid).sum(1)


class TEncModule(tnn.Module):
    def __init__(self, in_channels, num_codes=32):
        super().__init__()
        self.encoding_project = TConvBNReLU(in_channels, in_channels, 1,
                                            padding=0)
        self.encoding = TEncoding(in_channels, num_codes)
        self.enc_bn = tnn.BatchNorm1d(num_codes)
        self.fc = tnn.Linear(in_channels, in_channels)

    def forward(self, x):
        en = self.encoding(self.encoding_project(x))   # [N, K, C]
        en = torch.relu(self.enc_bn(en))
        feat = en.mean(dim=1)
        gamma = torch.sigmoid(self.fc(feat))
        out = torch.relu(x + x * gamma[:, :, None, None])
        return feat, out


class TEncHead(tnn.Module):
    def __init__(self, in_channels, num_classes, num_codes=32, mid=512,
                 from_jpu=False):
        super().__init__()
        if from_jpu:
            self.bottleneck = TConvBNReLU(in_channels, mid, 1, padding=0)
        else:
            self.bottleneck = TConvBNReLU(in_channels, mid, 3)
        self.enc_module = TEncModule(mid, num_codes)
        self.cls = tnn.Conv2d(mid, num_classes, 1)
        self.se_layer = tnn.Linear(mid, num_classes)

    def forward(self, x):
        feat, out = self.enc_module(self.bottleneck(x))
        return self.cls(out)  # (se head exercised via weights only)


# ----------------------------------------------------------------- fastfcn
class TJPU(tnn.Module):
    def __init__(self, in_channels, width=512):
        super().__init__()
        self.convs = tnn.ModuleList(
            TConvBNReLU(ch, width, 3) for ch in in_channels)
        self.dilations = tnn.ModuleList(
            TSepConvBNReLU(3 * width, width, 3, dilation=r)
            for r in (1, 2, 4, 8))

    def forward(self, feats):
        feats = [conv(f) for conv, f in zip(self.convs, feats)]
        size = feats[0].shape[2:]
        ups = [feats[0]] + [
            F.interpolate(f, size=size, mode="bilinear",
                          align_corners=False) for f in feats[1:]]
        x = torch.cat(ups, 1)
        return torch.cat([d(x) for d in self.dilations], 1)


class TFastFCN(tnn.Module):
    def __init__(self, num_classes=6):
        super().__init__()
        self.backbone = TResNet18VD(output_stride=32)
        self.jpu = TJPU((128, 256, 512))
        self.head = TEncHead(2048, num_classes, from_jpu=True)

    def forward(self, x):
        feats = self.backbone(x)[1:]
        fused = self.jpu(feats)
        logits = self.head(fused)
        return F.interpolate(logits, size=x.shape[2:], mode="bilinear",
                             align_corners=False)


def test_fastfcn_parity(rng):
    from tlxcv_tpu.models.backbones import resnet18_vd
    from tlxcv_tpu.models.segmentation import FastFCN

    model = FastFCN(num_classes=6,
                    backbone=resnet18_vd(output_stride=32))
    seg_roundtrip(TFastFCN(), model, _x(rng, 64, batch=1), atol=1e-3)


# ------------------------------------------------------------------ encnet
class TENCNet(tnn.Module):
    def __init__(self, num_classes=6):
        super().__init__()
        self.backbone = TResNet18VD(output_stride=8)
        self.head = TEncHead(512, num_classes)

    def forward(self, x):
        feats = self.backbone(x)
        logits = self.head(feats[-1])
        return F.interpolate(logits, size=x.shape[2:], mode="bilinear",
                             align_corners=False)


def test_encnet_parity(rng):
    from tlxcv_tpu.models.backbones import resnet18_vd
    from tlxcv_tpu.models.segmentation import ENCNet

    model = ENCNet(num_classes=6, backbone=resnet18_vd())
    seg_roundtrip(TENCNet(), model, _x(rng, 64, batch=1), atol=1e-3)


# --------------------------------------------------------------- hrnet fcn
class THRNetFCN(tnn.Module):
    def __init__(self, num_classes=6,
                 c2=(8, 16), c3=(8, 16, 32), c4=(8, 16, 32, 64)):
        super().__init__()

        class Trunk(tnn.Module):
            def __init__(self):
                super().__init__()
                self.conv1 = TCBR(3, 64, 3, 2)
                self.conv2 = TCBR(64, 64, 3, 2)
                self.layer1 = tnn.ModuleList(
                    [THRBottleneck(64, 8, downsample=True)])
                self.tr1 = TTransition([32], c2)
                self.st2 = tnn.ModuleList([THRModule(c2, (1, 1))])
                self.tr2 = TTransition(c2, c3)
                self.st3 = tnn.ModuleList([THRModule(c3, (1, 1, 1))])
                self.tr3 = TTransition(c3, c4)
                self.st4 = tnn.ModuleList([THRModule(c4, (1, 1, 1, 1))])

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
                return xs

        class Head(tnn.Module):
            def __init__(self, cin):
                super().__init__()
                self.conv = TConvBNReLU(cin, cin, 1, padding=0)
                self.cls = tnn.Conv2d(cin, num_classes, 1)

            def forward(self, x):
                return self.cls(self.conv(x))

        self.backbone = Trunk()
        self.head = Head(sum(c4))

    def forward(self, x):
        xs = self.backbone(x)
        size = xs[0].shape[2:]
        ups = [xs[0]] + [F.interpolate(b, size=size, mode="bilinear",
                                       align_corners=False) for b in xs[1:]]
        feat = torch.cat(ups, 1)
        return F.interpolate(self.head(feat), size=x.shape[2:],
                             mode="bilinear", align_corners=False)


def test_hrnet_fcn_parity(rng):
    from tlxcv_tpu.models.backbones.hrnet import HRNet
    from tlxcv_tpu.models.segmentation import FCN

    bb = HRNet(stage1_num_modules=1, stage1_num_blocks=(1,),
               stage1_num_channels=(8,),
               stage2_num_modules=1, stage2_num_blocks=(1, 1),
               stage2_num_channels=(8, 16),
               stage3_num_modules=1, stage3_num_blocks=(1, 1, 1),
               stage3_num_channels=(8, 16, 32),
               stage4_num_modules=1, stage4_num_blocks=(1, 1, 1, 1),
               stage4_num_channels=(8, 16, 32, 64))
    model = FCN(num_classes=6, backbone=bb)
    seg_roundtrip(THRNetFCN(), model, _x(rng, 64, batch=1))
