"""TOOD — Task-aligned One-stage Object Detection.

The reference README claims TOOD complete (reference README.md:124) but
ships no source; built from scratch to the mmdet/PaddleDet tood_r50
spec, TPU-first:

- ResNet-50 + P3-P7 FPN; a shared 6-conv **interactive feature stack**;
  per-task :class:`TaskDecomposition` (layer attention over the stack +
  1x1 reduction) for cls and reg.
- Classification alignment: per-pixel probability map multiplied into
  the logits (geometric mean).  Localization alignment: the predicted
  distance map is **re-sampled at learned per-side offsets** — the
  deformable-sampling step expressed as a batched bilinear gather
  (static shapes, 4 corner gathers; no DCN custom op needed).
- TAL assignment (reused from the PPYOLOE rebuild,
  ppyoloe.task_aligned_assign) with normalized alignment soft targets;
  QFL-style cls loss + GIoU weighted by the targets.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ... import nn
from ...core import init as _I
from ...core.module import Module, is_training
from ...ops import multiclass_nms
from ...ops.boxes import aligned_iou, distance2bbox
from .fcos import FPNP3P7, _Scale
from .ppyoloe import task_aligned_assign

__all__ = ["TOOD", "TOODHead", "TaskDecomposition", "tood_r50"]

STRIDES = (8, 16, 32, 64, 128)


class TaskDecomposition(Module):
    """Layer attention over the interactive stack + 1x1 reduction."""

    def __init__(self, ch=256, stacked=6, down_rate=8):
        self.la_conv1 = nn.Conv2d(stacked * ch, stacked * ch // down_rate, 1)
        self.la_conv2 = nn.Conv2d(stacked * ch // down_rate, stacked, 1)
        self.reduction = nn.Conv2d(stacked * ch, ch, 1, bias=False)
        self.norm = nn.GroupNorm(32, ch)
        self.stacked = stacked
        self.ch = ch

    def __call__(self, stack_cat, avg_feat):
        """stack_cat [N,H,W,stacked*ch]; avg_feat [N,1,1,stacked*ch]."""
        w = jax.nn.sigmoid(self.la_conv2(nn.relu(self.la_conv1(avg_feat))))
        # broadcast per-layer weights over that layer's channel block
        w = jnp.repeat(w, self.ch, axis=-1)                  # [N,1,1,S*C]
        return nn.relu(self.norm(self.reduction(stack_cat * w)))


def _bilinear_sample(feat, xs, ys):
    """Sample [N,H,W,C] at fractional (xs, ys) [N,H,W] -> [N,H,W,C];
    border-clamped.  The TOOD deformable-sampling step as plain gathers."""
    n, h, w, c = feat.shape
    xs = jnp.clip(xs, 0.0, w - 1.0)
    ys = jnp.clip(ys, 0.0, h - 1.0)
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    x1 = jnp.minimum(x0 + 1, w - 1.0)
    y1 = jnp.minimum(y0 + 1, h - 1.0)
    wx = (xs - x0)[..., None]
    wy = (ys - y0)[..., None]

    flat = feat.reshape(n, h * w, c)

    def g(yi, xi):
        idx = (yi * w + xi).astype(jnp.int32).reshape(n, -1)
        return jnp.take_along_axis(flat, idx[..., None], 1).reshape(
            n, h, w, c)

    v00 = g(y0, x0)
    v01 = g(y0, x1)
    v10 = g(y1, x0)
    v11 = g(y1, x1)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


class TOODHead(Module):
    def __init__(self, in_ch=256, num_classes=80, stacked=6,
                 num_levels=len(STRIDES), prior_prob=0.01):
        winit = lambda s: _I.normal(s, std=0.01)
        self.inter_convs = []
        for _ in range(stacked):
            self.inter_convs.append(nn.Conv2d(in_ch, in_ch, 3, padding=1,
                                              w_init=winit))
            self.inter_convs.append(nn.GroupNorm(32, in_ch))
        self.cls_decomp = TaskDecomposition(in_ch, stacked)
        self.reg_decomp = TaskDecomposition(in_ch, stacked)
        bias = -math.log((1 - prior_prob) / prior_prob)
        self.cls_pred = nn.Conv2d(in_ch, num_classes, 3, padding=1,
                                  w_init=winit,
                                  b_init=lambda s: jnp.full(s, bias))
        self.reg_pred = nn.Conv2d(in_ch, 4, 3, padding=1, w_init=winit)
        # alignment: per-pixel cls probability + per-side reg offsets
        self.cls_prob_conv1 = nn.Conv2d(stacked * in_ch, in_ch // 4, 1,
                                        w_init=winit)
        self.cls_prob_conv2 = nn.Conv2d(in_ch // 4, 1, 3, padding=1,
                                        w_init=winit,
                                        b_init=lambda s: jnp.full(s, bias))
        self.reg_offset_conv1 = nn.Conv2d(stacked * in_ch, in_ch // 4, 1,
                                          w_init=winit)
        self.reg_offset_conv2 = nn.Conv2d(in_ch // 4, 4 * 2, 3, padding=1,
                                          b_init=lambda s: jnp.zeros(s))
        self.scales = [_Scale() for _ in range(num_levels)]
        self.num_classes = num_classes
        self.stacked = stacked

    def __call__(self, feats):
        """-> per level (cls_logits [N,H,W,C] alignment-fused,
        distances [N,H,W,4] in stride units, offset-aligned)."""
        outs = []
        for li, f in enumerate(feats):
            inter = []
            x = f
            for i in range(0, len(self.inter_convs), 2):
                x = nn.relu(self.inter_convs[i + 1](
                    self.inter_convs[i](x)))
                inter.append(x)
            stack_cat = jnp.concatenate(inter, -1)
            avg = jnp.mean(stack_cat, axis=(1, 2), keepdims=True)

            cls_feat = self.cls_decomp(stack_cat, avg)
            reg_feat = self.reg_decomp(stack_cat, avg)

            logits = self.cls_pred(cls_feat)
            prob = self.cls_prob_conv2(nn.relu(
                self.cls_prob_conv1(stack_cat)))
            # geometric-mean fusion in probability space, back to logits
            p = jnp.sqrt(jnp.clip(
                jax.nn.sigmoid(logits.astype(jnp.float32))
                * jax.nn.sigmoid(prob.astype(jnp.float32)), 1e-6, 1 - 1e-6))
            cls_out = jnp.log(p) - jnp.log1p(-p)

            dist = nn.relu(self.scales[li](self.reg_pred(reg_feat)))
            off = self.reg_offset_conv2(nn.relu(
                self.reg_offset_conv1(stack_cat))).astype(jnp.float32)
            n, h, w, _ = dist.shape
            gx = jax.lax.broadcasted_iota(jnp.float32, (n, h, w), 2)
            gy = jax.lax.broadcasted_iota(jnp.float32, (n, h, w), 1)
            aligned = []
            for side in range(4):
                d = _bilinear_sample(
                    dist[..., side:side + 1].astype(jnp.float32),
                    gx + off[..., 2 * side + 1], gy + off[..., 2 * side])
                aligned.append(d[..., 0])
            outs.append((cls_out, jnp.stack(aligned, -1)))
        return outs


def _points(feat_hws, strides=STRIDES):
    pts, sts = [], []
    for (h, w), s in zip(feat_hws, strides):
        xs = (np.arange(w, dtype=np.float32) + 0.5) * s
        ys = (np.arange(h, dtype=np.float32) + 0.5) * s
        gx, gy = np.meshgrid(xs, ys)
        pts.append(np.stack([gx.reshape(-1), gy.reshape(-1)], -1))
        sts.append(np.full((h * w,), s, np.float32))
    return np.concatenate(pts), np.concatenate(sts)


class TOOD(Module):
    def __init__(self, num_classes=80, backbone=None, score_threshold=0.05,
                 nms_threshold=0.6, nms_top_k=1000, keep_top_k=100):
        from ..classification.resnet import ResNet

        self.backbone = backbone if backbone is not None else \
            ResNet(depth=50, num_classes=0, with_pool=False)
        self.neck = FPNP3P7(self.backbone.feat_channels[1:], 256)
        self.head = TOODHead(256, num_classes)
        self.num_classes = num_classes
        self.nms_cfg = dict(score_threshold=score_threshold,
                            nms_threshold=nms_threshold,
                            nms_top_k=nms_top_k, keep_top_k=keep_top_k)

    def head_outputs(self, images):
        c3, c4, c5 = self.backbone.features(images)[1:]
        feats = self.neck([c3, c4, c5])
        return self.head(feats), tuple(f.shape[1:3] for f in feats)

    def _flatten(self, outs, feat_hws):
        n = outs[0][0].shape[0]
        cls = jnp.concatenate(
            [o[0].reshape(n, -1, self.num_classes) for o in outs], 1)
        points, strides = _points(feat_hws)
        dist = jnp.concatenate(
            [o[1].reshape(n, -1, 4) for o in outs], 1).astype(jnp.float32)
        boxes = distance2bbox(jnp.asarray(points)[None],
                              dist * jnp.asarray(strides)[None, :, None])
        return cls.astype(jnp.float32), boxes, points, strides

    def __call__(self, images):
        outs, feat_hws = self.head_outputs(images)
        if is_training():
            return {"outs": outs, "feat_hws": feat_hws,
                    "image_hw": images.shape[1:3]}
        cls, boxes, _, _ = self._flatten(outs, feat_hws)
        from ...ops.boxes import clip_boxes

        boxes = clip_boxes(boxes, images.shape[1:3])
        return multiclass_nms(boxes, jax.nn.sigmoid(cls), **self.nms_cfg)

    def loss_fn(self, outputs, targets):
        gt_boxes = targets["boxes"].astype(jnp.float32)
        gt_labels = targets["class_labels"].astype(jnp.int32)
        gt_valid = targets.get("mask")
        if gt_valid is None:
            gt_valid = (gt_boxes[..., 2] > gt_boxes[..., 0]).astype(jnp.float32)

        cls, boxes, points, strides = self._flatten(outputs["outs"],
                                                    outputs["feat_hws"])
        bsz, m = gt_valid.shape
        pm = jnp.broadcast_to(gt_valid[..., None],
                              (bsz, m, cls.shape[1])).astype(jnp.float32)
        labels, t_boxes, scores = task_aligned_assign(
            jax.lax.stop_gradient(jax.nn.sigmoid(cls)),
            jax.lax.stop_gradient(boxes), jnp.asarray(points),
            gt_labels, gt_boxes, pm, bg_index=self.num_classes,
            num_classes=self.num_classes)
        pos = labels < self.num_classes
        t = scores                                        # soft targets
        norm = jnp.maximum(t.sum(), 1.0)

        sig = jax.nn.sigmoid(cls)
        bce = (jnp.maximum(cls, 0) - cls * t
               + jnp.log1p(jnp.exp(-jnp.abs(cls))))
        qfl = (jnp.abs(t - sig) ** 2 * bce).sum(-1)
        cls_loss = qfl.sum() / norm

        w = jnp.where(pos, t.max(-1), 0.0)
        giou = 1.0 - aligned_iou(boxes, t_boxes, mode="giou")
        box_loss = (giou * w).sum() / jnp.maximum(w.sum(), 1e-6)
        return cls_loss + 2.0 * box_loss


def tood_r50(num_classes=80, **kwargs):
    return TOOD(num_classes=num_classes, **kwargs)
