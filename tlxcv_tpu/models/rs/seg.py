"""Remote-sensing segmentation models (reference tlxcv/models/rs/seg/
models/{farseg.py, unet.py, deeplab.py}), NHWC."""
from __future__ import annotations

import jax.numpy as jnp

from ... import nn
from ...ops.image import interpolate
from ..classification.resnet import ResNet
from ..segmentation.deeplab import DeepLabV3P  # noqa: F401 (rs deeplab = same)
from .layers import Conv1x1, Conv3x3

__all__ = ["FarSeg", "RSUNet", "DeepLabV3P"]


class FPN(nn.Module):
    def __init__(self, in_channels, out_ch=256):
        self.lateral = [Conv1x1(c, out_ch) for c in in_channels]
        self.output = [Conv3x3(out_ch, out_ch) for _ in in_channels]

    def __call__(self, feats):
        lats = [l(f) for l, f in zip(self.lateral, feats)]
        outs = [lats[-1]]
        for i in range(len(lats) - 2, -1, -1):
            up = interpolate(outs[0], size=lats[i].shape[1:3], mode="nearest")
            outs.insert(0, lats[i] + up)
        return [o(f) for o, f in zip(self.output, outs)]


class FarSeg(nn.Module):
    """Foreground-aware relation segmentation (reference farseg.py:243):
    resnet + FPN + scene-embedding foreground modulation."""

    def __init__(self, num_classes=16, backbone_depth=50, fpn_ch=256,
                 out_ch=128):
        self.backbone = ResNet(depth=backbone_depth, num_classes=0,
                               with_pool=False)
        self.fpn = FPN(self.backbone.feat_channels, fpn_ch)
        c5 = self.backbone.feat_channels[-1]
        self.scene_embed = nn.Conv2d(c5, fpn_ch, 1)
        self.fg_convs = [Conv3x3(fpn_ch, out_ch, norm=True, act=True)
                         for _ in range(4)]
        self.head = Conv1x1(out_ch, num_classes)

    def __call__(self, x):
        feats = self.backbone.features(x)
        fpn_feats = self.fpn(feats)
        scene = self.scene_embed(feats[-1].mean(axis=(1, 2), keepdims=True))
        outs = []
        size = fpn_feats[0].shape[1:3]
        for conv, f in zip(self.fg_convs, fpn_feats):
            # foreground relation: cosine modulation with the scene vector
            rel = nn.sigmoid(jnp.sum(f * scene, -1, keepdims=True) /
                             (jnp.linalg.norm(f, axis=-1, keepdims=True) *
                              jnp.linalg.norm(scene, axis=-1, keepdims=True)
                              + 1e-9))
            f = conv(f * rel)
            outs.append(interpolate(f, size=size, mode="bilinear"))
        fused = sum(outs) / len(outs)
        logits = self.head(fused)
        return interpolate(logits, size=x.shape[1:3], mode="bilinear")


class RSUNet(nn.Module):
    """Plain same-padding UNet used by PaddleRS (reference rs/seg unet.py)."""

    def __init__(self, in_channels=3, num_classes=2, width=64):
        w = [width * (2 ** i) for i in range(5)]

        def block(cin, cout):
            return nn.Sequential(Conv3x3(cin, cout, norm=True, act=True),
                                 Conv3x3(cout, cout, norm=True, act=True))

        self.enc = [block(in_channels if i == 0 else w[i - 1], w[i])
                    for i in range(5)]
        self.pool = nn.MaxPool2d(2, 2)
        self.up = [nn.ConvTranspose2d(w[i], w[i - 1], 2, stride=2)
                   for i in range(4, 0, -1)]
        self.dec = [block(w[i - 1] * 2, w[i - 1]) for i in range(4, 0, -1)]
        self.head = Conv1x1(w[0], num_classes)

    def __call__(self, x):
        skips = []
        for i, enc in enumerate(self.enc):
            if i > 0:
                x = self.pool(x)
            x = enc(x)
            skips.append(x)
        for i, (up, dec) in enumerate(zip(self.up, self.dec)):
            x = up(x)
            skip = skips[3 - i]
            x = dec(jnp.concatenate([skip, x], -1))
        return self.head(x)
