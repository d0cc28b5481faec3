"""CenterNet — objects as points (heatmap + size + offset heads).

The reference README claims CenterNet complete (reference README.md:125)
but ships no source; built from scratch to the classic
ResNet+3-deconv CenterNet spec (Zhou et al.; PaddleDet centernet_r50),
TPU-first:

- ResNet C5 -> three ConvTranspose(256/128/64) blocks to stride 4;
  3x3+1x1 head convs for heatmap (focal prior bias), wh, offset.
- **Vectorized Gaussian target stamping on device** (no host loops):
  the per-class heatmap is a max over per-GT gaussians evaluated on the
  full grid — one [H, W, M] broadcast per image under vmap (the same
  trick as the pose-heatmap targets, tasks/human_pose_estimation.py).
- Penalty-reduced focal loss at exact centers, L1 on wh/offset gathered
  at center indices.
- Decode without NMS: 3x3 max-pool peak selection + top-K, all in jit.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ... import nn
from ...core import init as _I
from ...core.module import Module, is_training

__all__ = ["CenterNet", "centernet_r50", "gaussian_radius"]


def gaussian_radius(h, w, min_overlap=0.7):
    """CornerNet radius (smallest root of the three overlap cases)."""
    a1 = 1.0
    b1 = h + w
    c1 = w * h * (1 - min_overlap) / (1 + min_overlap)
    r1 = (b1 - jnp.sqrt(jnp.maximum(b1 ** 2 - 4 * a1 * c1, 0.0))) / 2
    a2 = 4.0
    b2 = 2 * (h + w)
    c2 = (1 - min_overlap) * w * h
    r2 = (b2 - jnp.sqrt(jnp.maximum(b2 ** 2 - 4 * a2 * c2, 0.0))) / 2
    a3 = 4 * min_overlap
    b3 = -2 * min_overlap * (h + w)
    c3 = (min_overlap - 1) * w * h
    r3 = (b3 + jnp.sqrt(jnp.maximum(b3 ** 2 - 4 * a3 * c3, 0.0))) / 2
    return jnp.maximum(jnp.minimum(jnp.minimum(r1, r2), r3), 0.0)


class _DeconvBlock(Module):
    def __init__(self, c_in, c_out):
        self.conv = nn.Conv2d(c_in, c_out, 3, padding=1, bias=False)
        self.bn1 = nn.BatchNorm(c_out)
        self.up = nn.ConvTranspose2d(c_out, c_out, 4, stride=2, padding=1,
                                     bias=False)
        self.bn2 = nn.BatchNorm(c_out)

    def __call__(self, x):
        x = nn.relu(self.bn1(self.conv(x)))
        return nn.relu(self.bn2(self.up(x)))


class _Head(Module):
    def __init__(self, c_in, c_out, bias_val=0.0):
        self.conv = nn.Conv2d(c_in, 64, 3, padding=1)
        self.pred = nn.Conv2d(64, c_out, 1,
                              w_init=lambda s: _I.normal(s, std=0.01),
                              b_init=lambda s: jnp.full(s, bias_val))

    def __call__(self, x):
        return self.pred(nn.relu(self.conv(x)))


class CenterNet(Module):
    def __init__(self, num_classes=80, backbone=None, down_ratio=4,
                 top_k=100, score_threshold=0.1):
        from ..classification.resnet import ResNet

        self.backbone = backbone if backbone is not None else \
            ResNet(depth=50, num_classes=0, with_pool=False)
        c5 = self.backbone.feat_channels[-1]
        self.deconvs = [_DeconvBlock(c5, 256), _DeconvBlock(256, 128),
                        _DeconvBlock(128, 64)]
        prior = -math.log((1 - 0.1) / 0.1)
        self.hm_head = _Head(64, num_classes, bias_val=prior)
        self.wh_head = _Head(64, 2)
        self.off_head = _Head(64, 2)
        self.num_classes = num_classes
        self.down_ratio = down_ratio
        self.top_k = top_k
        self.score_threshold = score_threshold

    def head_outputs(self, images):
        x = self.backbone.features(images)[-1]
        for d in self.deconvs:
            x = d(x)
        return self.hm_head(x), self.wh_head(x), self.off_head(x)

    def __call__(self, images):
        hm, wh, off = self.head_outputs(images)
        if is_training():
            return {"hm": hm, "wh": wh, "off": off,
                    "image_hw": images.shape[1:3]}
        return self.decode(hm, wh, off)

    def decode(self, hm, wh, off):
        """Peak selection (3x3 max-pool equality) + top-K -> dets
        [N, K, 6] rows [label, score, x1, y1, x2, y2], counts [N]."""
        n, h, w, c = hm.shape
        prob = jax.nn.sigmoid(hm.astype(jnp.float32))
        pooled = nn.MaxPool2d(3, 1, 1)(prob)
        peaks = jnp.where(prob >= pooled, prob, 0.0)
        flat = peaks.reshape(n, -1)                       # [N, H*W*C]
        scores, idx = jax.lax.top_k(flat, self.top_k)
        cls = (idx % c).astype(jnp.float32)
        pix = idx // c
        ys = (pix // w).astype(jnp.float32)
        xs = (pix % w).astype(jnp.float32)

        def gather2(m, pix):
            return jnp.take_along_axis(m.reshape(n, -1, 2), pix[..., None], 1)

        o = gather2(off.astype(jnp.float32), pix)
        s = gather2(wh.astype(jnp.float32), pix)
        cx = (xs + o[..., 0]) * self.down_ratio
        cy = (ys + o[..., 1]) * self.down_ratio
        bw = s[..., 0] * self.down_ratio
        bh = s[..., 1] * self.down_ratio
        valid = scores > self.score_threshold
        dets = jnp.stack([cls, scores, cx - bw / 2, cy - bh / 2,
                          cx + bw / 2, cy + bh / 2], -1)
        dets = jnp.where(valid[..., None], dets,
                         jnp.asarray([-1, 0, 0, 0, 0, 0], dets.dtype))
        return dets, valid.sum(-1)

    # -- training ------------------------------------------------------
    def _targets(self, gt_boxes, gt_labels, gt_valid, hw):
        """Vectorized per-image target stamping."""
        h, w = hw
        r = self.down_ratio

        def per_image(boxes, labels, valid):
            bx = boxes / r
            cx = (bx[:, 0] + bx[:, 2]) * 0.5
            cy = (bx[:, 1] + bx[:, 3]) * 0.5
            bw = bx[:, 2] - bx[:, 0]
            bh = bx[:, 3] - bx[:, 1]
            ix = jnp.clip(jnp.floor(cx), 0, w - 1)
            iy = jnp.clip(jnp.floor(cy), 0, h - 1)
            rad = jnp.maximum(gaussian_radius(jnp.ceil(bh), jnp.ceil(bw)), 0.0)
            sigma = jnp.maximum((2 * rad + 1) / 6.0, 1e-3)

            gx = jnp.arange(w, dtype=jnp.float32)[None, :, None]  # [1,W,M]
            gy = jnp.arange(h, dtype=jnp.float32)[:, None, None]  # [H,1,M]
            g = jnp.exp(-(((gx - ix[None, None]) ** 2
                           + (gy - iy[None, None]) ** 2)
                          / (2 * sigma[None, None] ** 2)))        # [H,W,M]
            g = jnp.where(valid[None, None] > 0, g, 0.0)
            onehot = jax.nn.one_hot(labels, self.num_classes)     # [M,C]
            hm_t = jnp.einsum("hwm,mc->hwmc", g, onehot).max(2)   # [H,W,C]

            # exact-center positives + wh/offset regression targets
            pix = (iy * w + ix).astype(jnp.int32)
            pos_idx = jnp.where(valid > 0, pix, h * w)            # drop pad
            ind_hm = jnp.zeros((h * w, self.num_classes))
            ind_hm = ind_hm.at[pos_idx, labels].max(1.0, mode="drop")
            hm_t = jnp.maximum(hm_t, ind_hm.reshape(h, w, -1))
            return hm_t, pix, jnp.stack([bw, bh], -1), \
                jnp.stack([cx - ix, cy - iy], -1)

        return jax.vmap(per_image)(gt_boxes, gt_labels, gt_valid)

    def loss_fn(self, outputs, targets):
        gt_boxes = targets["boxes"].astype(jnp.float32)
        gt_labels = targets["class_labels"].astype(jnp.int32)
        gt_valid = targets.get("mask")
        if gt_valid is None:
            gt_valid = (gt_boxes[..., 2] > gt_boxes[..., 0]).astype(jnp.float32)

        hm = outputs["hm"].astype(jnp.float32)
        n, h, w, c = hm.shape
        hm_t, pix, wh_t, off_t = self._targets(gt_boxes, gt_labels,
                                               gt_valid, (h, w))
        prob = jnp.clip(jax.nn.sigmoid(hm), 1e-6, 1 - 1e-6)
        pos = hm_t >= 1.0 - 1e-6
        num_pos = jnp.maximum(gt_valid.sum(), 1.0)
        pos_loss = jnp.where(pos, -((1 - prob) ** 2) * jnp.log(prob), 0.0)
        neg_loss = jnp.where(~pos, -((1 - hm_t) ** 4) * (prob ** 2)
                             * jnp.log(1 - prob), 0.0)
        hm_loss = (pos_loss.sum() + neg_loss.sum()) / num_pos

        def gat(m, pix):
            return jnp.take_along_axis(
                m.astype(jnp.float32).reshape(n, -1, 2), pix[..., None], 1)

        vw = gt_valid[..., None]
        wh_loss = (jnp.abs(gat(outputs["wh"], pix) - wh_t) * vw).sum() \
            / num_pos
        off_loss = (jnp.abs(gat(outputs["off"], pix) - off_t) * vw).sum() \
            / num_pos
        return hm_loss + 0.1 * wh_loss + off_loss


def centernet_r50(num_classes=80, **kwargs):
    return CenterNet(num_classes=num_classes, **kwargs)
