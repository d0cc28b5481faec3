"""Fast-SCNN (reference tlxcv/models/segmentation/fast_scnn.py:
learning-to-downsample :100, global feature extractor :149, fusion :298),
NHWC."""
from __future__ import annotations

import jax.numpy as jnp

from ... import nn
from ...ops.image import interpolate
from .layers import (AuxLayer, ConvBN, ConvBNReLU, DepthwiseConvBN,
                     PPModule, SeparableConvBNReLU)

__all__ = ["FastSCNN"]


class LearningToDownsample(nn.Module):
    def __init__(self, dw_channels1=32, dw_channels2=48, out_channels=64):
        self.conv = ConvBNReLU(3, dw_channels1, 3, stride=2)
        self.dsconv1 = SeparableConvBNReLU(dw_channels1, dw_channels2, 3,
                                           stride=2)
        self.dsconv2 = SeparableConvBNReLU(dw_channels2, out_channels, 3,
                                           stride=2)

    def __call__(self, x):
        return self.dsconv2(self.dsconv1(self.conv(x)))


class InvertedBottleneck(nn.Module):
    def __init__(self, cin, cout, expansion=6, stride=1):
        hidden = cin * expansion
        self.use_res = stride == 1 and cin == cout
        self.block = nn.Sequential(
            ConvBNReLU(cin, hidden, 1, padding=0),
            DepthwiseConvBN(hidden, 3, stride=stride),
            ConvBN(hidden, cout, 1, padding=0))

    def __call__(self, x):
        out = self.block(x)
        return x + out if self.use_res else out


class GlobalFeatureExtractor(nn.Module):
    def __init__(self, in_channels=64, block_channels=(64, 96, 128),
                 out_channels=128, expansion=6, num_blocks=(3, 3, 3)):
        def stage(cin, cout, n, stride):
            blocks = [InvertedBottleneck(cin, cout, expansion, stride)]
            blocks += [InvertedBottleneck(cout, cout, expansion, 1)
                       for _ in range(n - 1)]
            return nn.Sequential(*blocks)

        self.bottleneck1 = stage(in_channels, block_channels[0], num_blocks[0], 2)
        self.bottleneck2 = stage(block_channels[0], block_channels[1], num_blocks[1], 2)
        self.bottleneck3 = stage(block_channels[1], block_channels[2], num_blocks[2], 1)
        self.ppm = PPModule(block_channels[2], out_channels)

    def __call__(self, x):
        return self.ppm(self.bottleneck3(self.bottleneck2(self.bottleneck1(x))))


class FeatureFusion(nn.Module):
    def __init__(self, high_ch=64, low_ch=128, out_ch=128):
        self.dwconv = ConvBNReLU(low_ch, out_ch, 3, dilation=1)
        self.low_proj = ConvBN(out_ch, out_ch, 1, padding=0)
        self.high_proj = ConvBN(high_ch, out_ch, 1, padding=0)

    def __call__(self, high, low):
        low = interpolate(low, size=high.shape[1:3], mode="bilinear")
        low = self.low_proj(self.dwconv(low))
        high = self.high_proj(high)
        return nn.relu(high + low)


class FastSCNN(nn.Module):
    def __init__(self, num_classes=19, enable_auxiliary_loss=False):
        self.ltd = LearningToDownsample()
        self.gfe = GlobalFeatureExtractor()
        self.fusion = FeatureFusion()
        self.classifier = nn.Sequential(
            SeparableConvBNReLU(128, 128, 3), SeparableConvBNReLU(128, 128, 3),
            nn.Dropout(0.1), nn.Conv2d(128, num_classes, 1))
        self.aux = (AuxLayer(64, 32, num_classes)
                    if enable_auxiliary_loss else None)
        self.enable_aux = enable_auxiliary_loss

    def __call__(self, x):
        size = x.shape[1:3]
        high = self.ltd(x)
        low = self.gfe(high)
        fused = self.fusion(high, low)
        logits = interpolate(self.classifier(fused), size=size, mode="bilinear")
        if self.enable_aux:
            aux = interpolate(self.aux(high), size=size, mode="bilinear")
            return [logits, aux]
        return logits
