"""Xception-65 DeepLab-variant classifier
(reference tlxcv/models/classification/xception_deeplab.py), NHWC."""
from __future__ import annotations

from ... import nn
from ...core.module import Module

__all__ = ["XceptionDeeplab", "xception_deeplab"]


class XceptionDeeplab(Module):
    """Xception-65 variant used as a DeepLab backbone head for
    classification (reference xception_deeplab.py) — separable convs with
    stride-1 exit flow."""

    def __init__(self, num_classes=1000, middle_blocks=16):
        from .xception import SeparableConv, XceptionBlock

        self.stem = nn.Sequential(
            nn.Conv2d(3, 32, 3, stride=2, padding=1, bias=False),
            nn.BatchNorm(32), nn.Activation("relu"),
            nn.Conv2d(32, 64, 3, padding=1, bias=False), nn.BatchNorm(64),
            nn.Activation("relu"))
        self.entry = nn.Sequential(
            XceptionBlock(64, 128, 2, 2, start_with_relu=False),
            XceptionBlock(128, 256, 2, 2), XceptionBlock(256, 728, 2, 2))
        self.middle = [XceptionBlock(728, 728, 3)
                       for _ in range(middle_blocks)]
        self.exit1 = XceptionBlock(728, 1024, 2, 2, grow_first=False)
        self.exit2 = nn.Sequential(SeparableConv(1024, 1536),
                                   nn.Activation("relu"),
                                   SeparableConv(1536, 1536),
                                   nn.Activation("relu"),
                                   SeparableConv(1536, 2048),
                                   nn.Activation("relu"))
        self.pool = nn.GlobalAvgPool2d()
        self.fc = nn.Linear(2048, num_classes)

    def __call__(self, x):
        x = self.entry(self.stem(x))
        for blk in self.middle:
            x = blk(x)
        x = self.exit2(self.exit1(x))
        return self.fc(self.pool(x))


def xception_deeplab(pretrained=False, **kw):
    return XceptionDeeplab(**kw)


def xception65_deeplab(pretrained=False, **kw):
    return XceptionDeeplab(middle_blocks=16, **kw)


def xception41_deeplab(pretrained=False, **kw):
    # 8 middle-flow blocks (reference README.md:90 xception41_deeplab)
    return XceptionDeeplab(middle_blocks=8, **kw)
