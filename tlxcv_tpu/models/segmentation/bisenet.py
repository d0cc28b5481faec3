"""BiSeNet V2 (reference tlxcv/models/segmentation/bisenet.py: detail
branch :180, semantic branch :203, BGA :241, SegHead :322), NHWC."""
from __future__ import annotations

import jax.numpy as jnp

from ... import nn
from ...ops.image import interpolate
from .layers import ConvBN, ConvBNReLU, DepthwiseConvBN

__all__ = ["BiSeNetV2"]


class StemBlock(nn.Module):
    def __init__(self, cin, cout):
        self.conv = ConvBNReLU(cin, cout, 3, stride=2)
        self.left = nn.Sequential(
            ConvBNReLU(cout, cout // 2, 1, padding=0),
            ConvBNReLU(cout // 2, cout, 3, stride=2))
        self.right = nn.MaxPool2d(3, 2, 1)
        self.fuse = ConvBNReLU(cout * 2, cout, 3)

    def __call__(self, x):
        x = self.conv(x)
        return self.fuse(jnp.concatenate([self.left(x), self.right(x)], -1))


class GatherExpand(nn.Module):
    def __init__(self, cin, cout, stride=1, expand=6):
        mid = cin * expand
        self.stride = stride
        self.conv1 = ConvBNReLU(cin, cin, 3)
        if stride == 2:
            self.dw1 = DepthwiseConvBN(cin, 3, stride=2)
            self.dw_mid = nn.Sequential(
                nn.Conv2d(cin, mid, 1, bias=False), nn.BatchNorm(mid))
            self.shortcut = nn.Sequential(
                DepthwiseConvBN(cin, 3, stride=2),
                ConvBN(cin, cout, 1, padding=0))
            self.dw2 = DepthwiseConvBN(mid, 3)
        else:
            self.dw_mid = nn.Sequential(
                nn.Conv2d(cin, mid, 1, bias=False), nn.BatchNorm(mid))
            self.dw2 = DepthwiseConvBN(mid, 3)
        self.proj = ConvBN(mid, cout, 1, padding=0)
        self.cin, self.cout = cin, cout

    def __call__(self, x):
        out = self.conv1(x)
        if self.stride == 2:
            out = self.dw1(out)
        out = self.dw2(nn.relu(self.dw_mid(out)))
        out = self.proj(out)
        res = self.shortcut(x) if self.stride == 2 else x
        if self.stride == 1 and self.cin != self.cout:
            return nn.relu(out)
        return nn.relu(out + res)


class ContextEmbedding(nn.Module):
    def __init__(self, cin):
        self.bn = nn.BatchNorm(cin)
        self.conv1 = ConvBNReLU(cin, cin, 1, padding=0)
        self.conv3 = nn.Conv2d(cin, cin, 3, padding=1)

    def __call__(self, x):
        gap = jnp.mean(x, axis=(1, 2), keepdims=True)
        ce = self.conv1(self.bn(gap)) + x
        return self.conv3(ce)


class DetailBranch(nn.Module):
    def __init__(self, channels=(64, 64, 128)):
        c1, c2, c3 = channels
        self.stage = nn.Sequential(
            ConvBNReLU(3, c1, 3, stride=2), ConvBNReLU(c1, c1, 3),
            ConvBNReLU(c1, c2, 3, stride=2), ConvBNReLU(c2, c2, 3),
            ConvBNReLU(c2, c2, 3),
            ConvBNReLU(c2, c3, 3, stride=2), ConvBNReLU(c3, c3, 3),
            ConvBNReLU(c3, c3, 3))

    def __call__(self, x):
        return self.stage(x)


class SemanticBranch(nn.Module):
    def __init__(self, channels=(16, 32, 64, 128)):
        c1, c2, c3, c4 = channels
        self.stem = StemBlock(3, c1)
        self.stage3 = nn.Sequential(GatherExpand(c1, c2, 2), GatherExpand(c2, c2))
        self.stage4 = nn.Sequential(GatherExpand(c2, c3, 2), GatherExpand(c3, c3))
        self.stage5 = nn.Sequential(
            GatherExpand(c3, c4, 2), GatherExpand(c4, c4),
            GatherExpand(c4, c4), GatherExpand(c4, c4))
        self.ce = ContextEmbedding(c4)

    def __call__(self, x):
        s2 = self.stem(x)
        s3 = self.stage3(s2)
        s4 = self.stage4(s3)
        s5 = self.stage5(s4)
        return s2, s3, s4, self.ce(s5)


class BGA(nn.Module):
    """Bilateral guided aggregation (reference :241)."""

    def __init__(self, ch=128):
        self.db_dw = nn.Sequential(DepthwiseConvBN(ch, 3),
                                   nn.Conv2d(ch, ch, 1))
        self.db_down = nn.Sequential(ConvBN(ch, ch, 3, stride=2),
                                     nn.AvgPool2d(3, 2, 1))
        self.sb_dw = nn.Sequential(DepthwiseConvBN(ch, 3),
                                   nn.Conv2d(ch, ch, 1))
        self.sb_conv = ConvBN(ch, ch, 3)
        self.proj = ConvBN(ch, ch, 3)

    def __call__(self, detail, semantic):
        d1 = self.db_dw(detail)
        d2 = self.db_down(detail)
        s1 = self.sb_conv(semantic)
        s2 = self.sb_dw(semantic)
        s1_up = interpolate(s1, size=detail.shape[1:3], mode="bilinear")
        left = d1 * nn.sigmoid(s1_up)
        right = d2 * nn.sigmoid(s2)
        right_up = interpolate(right, size=detail.shape[1:3], mode="bilinear")
        return self.proj(left + right_up)


class SegHead(nn.Module):
    def __init__(self, cin, mid, num_classes):
        self.conv = ConvBNReLU(cin, mid, 3)
        self.drop = nn.Dropout(0.1)
        self.cls = nn.Conv2d(mid, num_classes, 1)

    def __call__(self, x):
        return self.cls(self.drop(self.conv(x)))


class BiSeNetV2(nn.Module):
    def __init__(self, num_classes=19, lambd=0.25, align_corners=False):
        c1, c2, c3 = 64, 64, 128
        db = (c1, c2, c3)
        sb = (int(c1 * lambd), int(c2 * lambd), c3 // 2, c3)
        self.detail = DetailBranch(db)
        self.semantic = SemanticBranch(sb)
        self.bga = BGA(c3)
        self.head = SegHead(c3, c3, num_classes)
        self.aux_heads = [SegHead(sb[0], c1, num_classes),
                          SegHead(sb[1], c1, num_classes),
                          SegHead(sb[2], c1, num_classes),
                          SegHead(sb[3], c1, num_classes)]
        self.align_corners = align_corners

    def __call__(self, x):
        from ...core.module import is_training

        size = x.shape[1:3]
        detail = self.detail(x)
        s2, s3, s4, s5 = self.semantic(x)
        fused = self.bga(detail, s5)
        logits = interpolate(self.head(fused), size=size, mode="bilinear",
                             align_corners=self.align_corners)
        if is_training():
            auxs = [interpolate(h(f), size=size, mode="bilinear",
                                align_corners=self.align_corners)
                    for h, f in zip(self.aux_heads, (s2, s3, s4, s5))]
            return [logits] + auxs
        return logits
