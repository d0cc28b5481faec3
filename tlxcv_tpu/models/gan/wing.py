"""FAN facial-alignment aux network for StarGANv2
(reference tlxcv/models/gan/models/layers/wing.py:251 — CoordConvTh /
HourGlass producing facial heatmaps used to preserve landmarks), NHWC."""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ... import nn
from ...core.module import Module
from ...ops.image import interpolate

__all__ = ["CoordConvTh", "HourGlass", "FAN"]


class AddCoords(Module):
    """Append normalized coordinate (and optional radius/boundary) maps
    (reference wing.py AddCoordsTh :56-94 — channel order is
    (row, col[, r][, row_boundary, col_boundary]), r is max-normalized,
    and the boundary appends TWO coordinate maps masked where the
    boundary heatmap exceeds 0.05)."""

    def __init__(self, with_r=False, with_boundary=False):
        self.with_r = with_r
        self.with_boundary = with_boundary

    def __call__(self, x, heatmap=None):
        b, h, w, _ = x.shape
        rows = np.broadcast_to(
            (np.arange(h, dtype=np.float32) / (h - 1) * 2 - 1)[:, None],
            (h, w))
        cols = np.broadcast_to(
            (np.arange(w, dtype=np.float32) / (w - 1) * 2 - 1)[None, :],
            (h, w))
        rr_np = np.sqrt(rows ** 2 + cols ** 2)
        rr_np = rr_np / rr_np.max()
        row_m = jnp.broadcast_to(jnp.asarray(rows)[None, ..., None],
                                 (b, h, w, 1))
        col_m = jnp.broadcast_to(jnp.asarray(cols)[None, ..., None],
                                 (b, h, w, 1))
        feats = [x, row_m, col_m]
        if self.with_r:
            feats.append(jnp.broadcast_to(
                jnp.asarray(rr_np)[None, ..., None], (b, h, w, 1)))
        if self.with_boundary and heatmap is not None:
            boundary = jnp.clip(heatmap[..., -1:], 0.0, 1.0)
            keep = boundary > 0.05
            feats.append(jnp.where(keep, row_m, 0.0))
            feats.append(jnp.where(keep, col_m, 0.0))
        return jnp.concatenate(feats, -1)


class CoordConvTh(Module):
    """(reference wing.py CoordConvTh) conv over coord-augmented input."""

    def __init__(self, cin, cout, kernel_size=3, stride=1, padding=1,
                 with_r=False, with_boundary=False):
        self.coords = AddCoords(with_r, with_boundary)
        extra = 2 + int(with_r) + 2 * int(with_boundary)
        self.conv = nn.Conv2d(cin + extra, cout, kernel_size, stride=stride,
                              padding=padding)

    def __call__(self, x, heatmap=None):
        return self.conv(self.coords(x, heatmap))


class ConvBlock(Module):
    def __init__(self, cin, cout):
        half, quarter = cout // 2, cout // 4
        self.bn1 = nn.BatchNorm(cin)
        self.conv1 = nn.Conv2d(cin, half, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm(half)
        self.conv2 = nn.Conv2d(half, quarter, 3, padding=1, bias=False)
        self.bn3 = nn.BatchNorm(quarter)
        self.conv3 = nn.Conv2d(quarter, cout - half - quarter, 3, padding=1,
                               bias=False)
        self.down = None
        if cin != cout:
            self.down = nn.Sequential(nn.BatchNorm(cin), nn.Activation("relu"),
                                      nn.Conv2d(cin, cout, 1, bias=False))

    def __call__(self, x):
        y1 = self.conv1(nn.relu(self.bn1(x)))
        y2 = self.conv2(nn.relu(self.bn2(y1)))
        y3 = self.conv3(nn.relu(self.bn3(y2)))
        out = jnp.concatenate([y1, y2, y3], -1)
        return out + (x if self.down is None else self.down(x))


class HourGlass(Module):
    """(reference wing.py HourGlass) recursive encoder-decoder at `depth`."""

    def __init__(self, depth, features):
        self.depth = depth
        self.b1 = [ConvBlock(features, features) for _ in range(depth)]
        self.b2 = [ConvBlock(features, features) for _ in range(depth)]
        self.b3 = [ConvBlock(features, features) for _ in range(depth)]
        self.mid = ConvBlock(features, features)
        self.pool = nn.AvgPool2d(2, 2)

    def _forward(self, level, x):
        up1 = self.b1[level - 1](x)
        low = self.pool(x)
        low = self.b2[level - 1](low)
        if level > 1:
            low = self._forward(level - 1, low)
        else:
            low = self.mid(low)
        low = self.b3[level - 1](low)
        up2 = interpolate(low, size=up1.shape[1:3], mode="nearest")
        return up1 + up2

    def __call__(self, x):
        return self._forward(self.depth, x)


class FAN(Module):
    """Single-stack FAN producing 98-point facial heatmaps."""

    def __init__(self, num_landmarks=98, channels=64, hg_depth=3):
        self.stem = CoordConvTh(3, channels, 7, stride=2, padding=3,
                                with_r=True)
        self.bn1 = nn.BatchNorm(channels)
        self.block1 = ConvBlock(channels, channels * 2)
        self.pool = nn.AvgPool2d(2, 2)
        self.block2 = ConvBlock(channels * 2, channels * 2)
        self.hg = HourGlass(hg_depth, channels * 2)
        self.post = ConvBlock(channels * 2, channels * 2)
        self.head = nn.Conv2d(channels * 2, num_landmarks, 1)

    def __call__(self, x):
        x = nn.relu(self.bn1(self.stem(x)))
        x = self.pool(self.block1(x))
        x = self.block2(x)
        x = self.post(self.hg(x))
        return self.head(x)  # [B, H/4, W/4, num_landmarks]
