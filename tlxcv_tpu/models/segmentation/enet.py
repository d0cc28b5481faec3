"""ENet (reference tlxcv/models/segmentation/enet.py — incl. the
hand-rolled max_unpool2d :723, here ops.max_unpool2d), NHWC."""
from __future__ import annotations

import jax.numpy as jnp

from ... import nn
from ...ops.image import max_pool2d_with_argmax, max_unpool2d

__all__ = ["ENet"]


class InitialBlock(nn.Module):
    def __init__(self, cin=3, cout=16):
        self.conv = nn.Conv2d(cin, cout - cin, 3, stride=2, padding=1,
                              bias=False)
        self.bn = nn.BatchNorm(cout)

    def __call__(self, x):
        main = self.conv(x)
        pool = nn.MaxPool2d(2, 2)(x)
        out = jnp.concatenate([main, pool], -1)
        return nn.relu(self.bn(out))


class Bottleneck(nn.Module):
    def __init__(self, cin, cout, internal_ratio=4, kind="regular",
                 dilation=1, kernel_size=3, dropout=0.1):
        mid = cin // internal_ratio
        self.kind = kind
        stride = 2 if kind == "down" else 1
        self.conv1 = nn.Conv2d(cin, mid, 2 if kind == "down" else 1,
                               stride=stride, bias=False)
        self.bn1 = nn.BatchNorm(mid)
        if kind == "asymmetric":
            self.conv2a = nn.Conv2d(mid, mid, (kernel_size, 1),
                                    padding=(kernel_size // 2, 0), bias=False)
            self.bn2a = nn.BatchNorm(mid)
            self.conv2 = nn.Conv2d(mid, mid, (1, kernel_size),
                                   padding=(0, kernel_size // 2), bias=False)
        elif kind == "up":
            self.conv2 = nn.ConvTranspose2d(mid, mid, 2, stride=2, bias=False)
        else:
            self.conv2 = nn.Conv2d(mid, mid, kernel_size,
                                   padding=dilation * (kernel_size // 2),
                                   dilation=dilation, bias=False)
        self.bn2 = nn.BatchNorm(mid)
        self.conv3 = nn.Conv2d(mid, cout, 1, bias=False)
        self.bn3 = nn.BatchNorm(cout)
        self.drop = nn.Dropout(dropout)
        self.cin, self.cout = cin, cout
        if kind == "up":
            self.main_conv = nn.Conv2d(cin, cout, 1, bias=False)
            self.main_bn = nn.BatchNorm(cout)
        elif kind == "down" and cin != cout:
            pass  # channel pad on main branch

    def __call__(self, x, indices=None, output_hw=None):
        out = nn.relu(self.bn1(self.conv1(x)))
        if self.kind == "asymmetric":
            out = nn.relu(self.bn2a(self.conv2a(out)))
        out = nn.relu(self.bn2(self.conv2(out)))
        out = self.drop(self.bn3(self.conv3(out)))

        if self.kind == "down":
            main, idx = max_pool2d_with_argmax(x, 2, 2)
            if self.cout > self.cin:
                pad = self.cout - self.cin
                main = jnp.pad(main, [(0, 0), (0, 0), (0, 0), (0, pad)])
            return nn.relu(main + out), idx
        if self.kind == "up":
            main = self.main_bn(self.main_conv(x))
            main = max_unpool2d(main, indices, output_hw)
            return nn.relu(main + out)
        return nn.relu(x + out)


class ENet(nn.Module):
    def __init__(self, num_classes=19, encoder_relu=True):
        self.initial = InitialBlock()
        # stage 1
        self.down1 = Bottleneck(16, 64, kind="down", dropout=0.01)
        self.s1 = [Bottleneck(64, 64, dropout=0.01) for _ in range(4)]
        # stage 2
        self.down2 = Bottleneck(64, 128, kind="down")
        self.s2 = [
            Bottleneck(128, 128), Bottleneck(128, 128, dilation=2, kind="dilated"),
            Bottleneck(128, 128, kind="asymmetric", kernel_size=5),
            Bottleneck(128, 128, dilation=4, kind="dilated"),
            Bottleneck(128, 128), Bottleneck(128, 128, dilation=8, kind="dilated"),
            Bottleneck(128, 128, kind="asymmetric", kernel_size=5),
            Bottleneck(128, 128, dilation=16, kind="dilated"),
        ]
        # stage 3 (same topology as stage 2, no downsample)
        self.s3 = [
            Bottleneck(128, 128), Bottleneck(128, 128, dilation=2, kind="dilated"),
            Bottleneck(128, 128, kind="asymmetric", kernel_size=5),
            Bottleneck(128, 128, dilation=4, kind="dilated"),
            Bottleneck(128, 128), Bottleneck(128, 128, dilation=8, kind="dilated"),
            Bottleneck(128, 128, kind="asymmetric", kernel_size=5),
            Bottleneck(128, 128, dilation=16, kind="dilated"),
        ]
        # decoder
        self.up4 = Bottleneck(128, 64, kind="up")
        self.s4 = [Bottleneck(64, 64), Bottleneck(64, 64)]
        self.up5 = Bottleneck(64, 16, kind="up")
        self.s5 = [Bottleneck(16, 16)]
        self.final = nn.ConvTranspose2d(16, num_classes, 3, stride=2,
                                        padding=1, output_padding=1)

    def __call__(self, x):
        x = self.initial(x)
        hw1 = x.shape[1:3]
        x, idx1 = self.down1(x)
        for b in self.s1:
            x = b(x)
        hw2 = x.shape[1:3]
        x, idx2 = self.down2(x)
        for b in self.s2:
            x = b(x)
        for b in self.s3:
            x = b(x)
        x = self.up4(x, indices=idx2[..., :64], output_hw=hw2)
        for b in self.s4:
            x = b(x)
        x = self.up5(x, indices=idx1[..., :16], output_hw=hw1)
        for b in self.s5:
            x = b(x)
        return self.final(x)
