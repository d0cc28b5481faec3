"""GFL — Generalized Focal Loss detector (QFL + DFL + box distributions).

The reference README claims GFL complete (reference README.md:123) but
ships no source; built from scratch to the mmdet/PaddleDet
gfl_r50_fpn_1x spec, TPU-first:

- ResNet-50 + P3-P7 FPN, FCOS-style 4-conv GN towers, one anchor per
  cell (ATSS scale-8), per-level scale on the regression output.
- Regression is a **discrete distribution**: 4 x (reg_max+1) logits;
  distances are the softmax integral (one matmul with the 0..reg_max
  projection — MXU-friendly).
- ATSS assignment (reused from the PPYOLOE rebuild,
  ppyoloe.atss_assign) with predicted-IoU quality targets.
- Losses: Quality Focal (|t - sigma(x)|^2-weighted BCE with the IoU as
  soft target), Distribution Focal (CE over the two adjacent bins),
  GIoU — all normalized by the summed quality targets, the GFL recipe.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ... import nn
from ...core import init as _I
from ...core.module import Module, Param, is_training
from ...ops import multiclass_nms
from ...ops.boxes import aligned_iou, bbox2distance, distance2bbox
from .fcos import FPNP3P7, _Scale
from .ppyoloe import atss_assign

__all__ = ["GFL", "GFLHead", "gfl_r50"]

STRIDES = (8, 16, 32, 64, 128)


def _cell_anchors(feat_hws, strides=STRIDES, scale=8):
    """One ATSS anchor per cell: square, side scale*stride."""
    out, counts = [], []
    for (h, w), s in zip(feat_hws, strides):
        cx = (np.arange(w, dtype=np.float32) + 0.5) * s
        cy = (np.arange(h, dtype=np.float32) + 0.5) * s
        cxg, cyg = np.meshgrid(cx, cy)
        centers = np.stack([cxg, cyg], -1).reshape(-1, 2)
        half = scale * s / 2.0
        out.append(np.concatenate([centers - half, centers + half], -1))
        counts.append(len(centers))
    return np.concatenate(out), counts


class GFLHead(Module):
    def __init__(self, in_ch=256, num_classes=80, num_convs=4, reg_max=16,
                 num_levels=len(STRIDES), prior_prob=0.01):
        def tower():
            convs = []
            for _ in range(num_convs):
                convs.append(nn.Conv2d(
                    in_ch, in_ch, 3, padding=1,
                    w_init=lambda s: _I.normal(s, std=0.01)))
                convs.append(nn.GroupNorm(32, in_ch))
            return convs

        self.cls_tower = tower()
        self.reg_tower = tower()
        bias = -math.log((1 - prior_prob) / prior_prob)
        self.cls_pred = nn.Conv2d(in_ch, num_classes, 3, padding=1,
                                  w_init=lambda s: _I.normal(s, std=0.01),
                                  b_init=lambda s: jnp.full(s, bias))
        self.reg_pred = nn.Conv2d(in_ch, 4 * (reg_max + 1), 3, padding=1,
                                  w_init=lambda s: _I.normal(s, std=0.01))
        self.scales = [_Scale() for _ in range(num_levels)]
        self.reg_max = reg_max
        self.num_classes = num_classes

    @staticmethod
    def _run(tower, x):
        for i in range(0, len(tower), 2):
            x = nn.relu(tower[i + 1](tower[i](x)))
        return x

    def __call__(self, feats):
        outs = []
        for li, f in enumerate(feats):
            c = self._run(self.cls_tower, f)
            r = self._run(self.reg_tower, f)
            outs.append((self.cls_pred(c),
                         self.scales[li](self.reg_pred(r))))
        return outs


def integral(dist_logits, reg_max):
    """[..., 4*(reg_max+1)] logits -> [..., 4] expected distances in bin
    units (softmax @ arange — a tiny MXU matmul)."""
    shape = dist_logits.shape[:-1] + (4, reg_max + 1)
    p = jax.nn.softmax(dist_logits.reshape(shape), -1)
    proj = jnp.arange(reg_max + 1, dtype=p.dtype)
    return p @ proj


class GFL(Module):
    def __init__(self, num_classes=80, backbone=None, reg_max=16,
                 score_threshold=0.025, nms_threshold=0.6, nms_top_k=1000,
                 keep_top_k=100):
        from ..classification.resnet import ResNet

        self.backbone = backbone if backbone is not None else \
            ResNet(depth=50, num_classes=0, with_pool=False)
        self.neck = FPNP3P7(self.backbone.feat_channels[1:], 256)
        self.head = GFLHead(256, num_classes, reg_max=reg_max)
        self.num_classes = num_classes
        self.reg_max = reg_max
        self.nms_cfg = dict(score_threshold=score_threshold,
                            nms_threshold=nms_threshold,
                            nms_top_k=nms_top_k, keep_top_k=keep_top_k)
        self._anchor_cache = {}

    def _anchors(self, feat_hws):
        key = tuple(feat_hws)
        if key not in self._anchor_cache:
            self._anchor_cache[key] = _cell_anchors(key)
        return self._anchor_cache[key]

    def head_outputs(self, images):
        c3, c4, c5 = self.backbone.features(images)[1:]
        feats = self.neck([c3, c4, c5])
        return self.head(feats), tuple(f.shape[1:3] for f in feats)

    def _flatten(self, outs):
        n = outs[0][0].shape[0]
        cls = jnp.concatenate(
            [o[0].reshape(n, -1, self.num_classes) for o in outs], 1)
        dist = jnp.concatenate(
            [o[1].reshape(n, -1, 4 * (self.reg_max + 1)) for o in outs], 1)
        return cls.astype(jnp.float32), dist.astype(jnp.float32)

    def _points_strides(self, feat_hws):
        anchors, counts = self._anchors(feat_hws)
        centers = (anchors[:, :2] + anchors[:, 2:]) * 0.5
        strides = np.concatenate([
            np.full((c,), s, np.float32) for c, s in zip(counts, STRIDES)])
        return (jnp.asarray(anchors), counts, jnp.asarray(centers),
                jnp.asarray(strides))

    def __call__(self, images):
        outs, feat_hws = self.head_outputs(images)
        if is_training():
            return {"outs": outs, "feat_hws": feat_hws,
                    "image_hw": images.shape[1:3]}
        cls, dist = self._flatten(outs)
        _, _, centers, strides = self._points_strides(feat_hws)
        d = integral(dist, self.reg_max) * strides[None, :, None]
        boxes = distance2bbox(centers[None], d, max_shape=images.shape[1:3])
        return multiclass_nms(boxes, jax.nn.sigmoid(cls), **self.nms_cfg)

    def loss_fn(self, outputs, targets):
        gt_boxes = targets["boxes"].astype(jnp.float32)
        gt_labels = targets["class_labels"].astype(jnp.int32)
        gt_valid = targets.get("mask")
        if gt_valid is None:
            gt_valid = (gt_boxes[..., 2] > gt_boxes[..., 0]).astype(jnp.float32)

        cls, dist = self._flatten(outputs["outs"])
        anchors, counts, centers, strides = self._points_strides(
            outputs["feat_hws"])
        d_bins = integral(dist, self.reg_max)                # [B, A, 4]
        pred_boxes = distance2bbox(centers[None],
                                   d_bins * strides[None, :, None])

        bsz, m = gt_valid.shape
        pm = jnp.broadcast_to(gt_valid[..., None],
                              (bsz, m, cls.shape[1])).astype(jnp.float32)
        labels, t_boxes, scores = atss_assign(
            anchors, counts, gt_labels, gt_boxes, pm,
            bg_index=self.num_classes, num_classes=self.num_classes,
            pred_bboxes=jax.lax.stop_gradient(pred_boxes))
        pos = labels < self.num_classes                      # [B, A]
        # quality target = IoU of the prediction with its matched gt
        quality = scores.max(-1)                             # [B, A]
        norm = jnp.maximum(quality.sum(), 1.0)

        # Quality Focal Loss over all anchors
        onehot = jax.nn.one_hot(labels, self.num_classes + 1,
                                dtype=jnp.float32)[..., :self.num_classes]
        t = onehot * quality[..., None]
        sig = jax.nn.sigmoid(cls)
        bce = (jnp.maximum(cls, 0) - cls * t
               + jnp.log1p(jnp.exp(-jnp.abs(cls))))
        qfl = (jnp.abs(t - sig) ** 2 * bce).sum(-1)
        qfl_loss = qfl.sum() / norm

        # distance targets in BIN units: divide by stride FIRST, then
        # clamp to the distribution's support.  (r3 sweep regression:
        # clamping via bbox2distance(max_dis=reg_max) capped targets at
        # 16 *pixels* before the stride division, truncating every box
        # arm longer than 16 px — fixture mAP 0.39 instead of ~0.85.)
        t_dist = bbox2distance(centers[None], t_boxes) \
            / strides[None, :, None]
        t_dist = jnp.clip(t_dist, 0.0, self.reg_max - 0.1)

        # GIoU on positives, weighted by quality — against the TRUE
        # assigned boxes, not boxes re-derived from clipped targets
        giou = 1.0 - aligned_iou(pred_boxes, t_boxes, mode="giou")
        w = jnp.where(pos, quality, 0.0)
        giou_loss = (giou * w).sum() / norm

        # Distribution Focal Loss on positives
        logits = dist.reshape(dist.shape[:-1] + (4, self.reg_max + 1))
        logp = jax.nn.log_softmax(logits, -1)
        lo = jnp.floor(t_dist).astype(jnp.int32)
        hi = lo + 1
        wl = hi.astype(jnp.float32) - t_dist
        wr = 1.0 - wl
        ce_lo = -jnp.take_along_axis(logp, lo[..., None], -1)[..., 0]
        ce_hi = -jnp.take_along_axis(logp, jnp.clip(hi, 0, self.reg_max)
                                     [..., None], -1)[..., 0]
        dfl = (wl * ce_lo + wr * ce_hi).mean(-1)
        dfl_loss = (dfl * w).sum() / norm
        return qfl_loss + 2.0 * giou_loss + 0.25 * dfl_loss


def gfl_r50(num_classes=80, **kwargs):
    return GFL(num_classes=num_classes, **kwargs)
