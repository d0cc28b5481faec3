"""PicoDet — lightweight mobile detector on a PP-LCNet backbone.

The reference README claims picodet_lcnet complete
(reference README.md:114) but ships no source; built from scratch to
the PaddleDet picodet_s_lcnet spec, TPU-first:

- PP-LCNet backbone (reused from this framework's classification zoo)
  tapped at strides 8/16/32; depthwise CSP-PAN neck (5x5 dw + pw convs)
  with an extra stride-64 level; a combined cls+reg head per level
  (``share_cls_reg`` — one conv stack emits C + 4*(reg_max+1)).
- GFL-style distribution regression (reg_max=7, softmax-integral
  decode — reuses gfl.integral) with varifocal cls loss, DFL, GIoU.
- Task-aligned assignment (reused from the PPYOLOE rebuild).
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
from ...ops.boxes import aligned_iou, bbox2distance, distance2bbox
from .gfl import integral
from .ppyoloe import task_aligned_assign

__all__ = ["PicoDet", "picodet_lcnet"]

STRIDES = (8, 16, 32, 64)


class _LCFeatures(Module):
    """PP-LCNet tapped at strides 8/16/32 (after blocks 4/10/12)."""

    def __init__(self, scale=1.0):
        from ..classification.pp_lcnet import PPLCNet, make_divisible

        net = PPLCNet(scale=scale, num_classes=0 or 10)
        self.stem = net.stem
        self.blocks = net.blocks
        s = lambda c: make_divisible(c * scale, 8)
        self.out_channels = (s(128), s(256), s(512))

    def __call__(self, x):
        x = self.stem(x)
        outs = []
        for i, b in enumerate(self.blocks):
            x = b(x)
            if i in (4, 10, 12):
                outs.append(x)
        return outs


class _DWConv(Module):
    def __init__(self, c_in, c_out, k=5, s=1):
        self.dw = nn.Conv2d(c_in, c_in, k, stride=s, padding=k // 2,
                            groups=c_in, bias=False)
        self.dw_bn = nn.BatchNorm(c_in)
        self.pw = nn.Conv2d(c_in, c_out, 1, bias=False)
        self.pw_bn = nn.BatchNorm(c_out)

    def __call__(self, x):
        x = nn.hardswish(self.dw_bn(self.dw(x)))
        return nn.hardswish(self.pw_bn(self.pw(x)))


class _LCPAN(Module):
    """Depthwise top-down + bottom-up PAN at one shared width."""

    def __init__(self, in_channels, ch=96):
        self.reduce = [nn.Conv2d(c, ch, 1, bias=False) for c in in_channels]
        self.reduce_bn = [nn.BatchNorm(ch) for _ in in_channels]
        self.td = [_DWConv(2 * ch, ch) for _ in range(len(in_channels) - 1)]
        self.bu_down = [_DWConv(ch, ch, s=2)
                        for _ in range(len(in_channels) - 1)]
        self.bu = [_DWConv(2 * ch, ch) for _ in range(len(in_channels) - 1)]
        self.extra = _DWConv(ch, ch, s=2)      # stride-64 level
        self.out_channels = (ch,) * (len(in_channels) + 1)

    def __call__(self, feats):
        lat = [nn.hardswish(bn(r(f))) for r, bn, f in
               zip(self.reduce, self.reduce_bn, feats)]
        # top-down
        for i in range(len(lat) - 1, 0, -1):
            n, h, w, c = lat[i - 1].shape
            up = jax.image.resize(lat[i], (n, h, w, c), "nearest")
            lat[i - 1] = self.td[i - 1](
                jnp.concatenate([lat[i - 1], up], -1))
        # bottom-up
        outs = [lat[0]]
        for i in range(len(lat) - 1):
            outs.append(self.bu[i](jnp.concatenate(
                [self.bu_down[i](outs[-1]), lat[i + 1]], -1)))
        outs.append(self.extra(outs[-1]))
        return outs


class _PicoHead(Module):
    def __init__(self, ch, num_classes, reg_max=7, num_levels=4):
        out_ch = num_classes + 4 * (reg_max + 1)
        bias = -math.log((1 - 0.01) / 0.01)
        self.convs = [[_DWConv(ch, ch), _DWConv(ch, ch)]
                      for _ in range(num_levels)]
        self.preds = [nn.Conv2d(ch, out_ch, 1,
                                w_init=lambda s: _I.normal(s, std=0.01),
                                b_init=lambda s: jnp.full(s, bias))
                      for _ in range(num_levels)]
        self.num_classes = num_classes
        self.reg_max = reg_max

    def __call__(self, feats):
        outs = []
        for li, f in enumerate(feats):
            x = f
            for c in self.convs[li]:
                x = c(x)
            p = self.preds[li](x)
            outs.append((p[..., :self.num_classes],
                         p[..., self.num_classes:]))
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


class PicoDet(Module):
    def __init__(self, num_classes=80, scale=0.75, neck_ch=96, reg_max=7,
                 score_threshold=0.025, nms_threshold=0.6, nms_top_k=1000,
                 keep_top_k=100, backbone=None):
        self.backbone = backbone if backbone is not None \
            else _LCFeatures(scale)
        self.neck = _LCPAN(self.backbone.out_channels, neck_ch)
        self.head = _PicoHead(neck_ch, num_classes, reg_max)
        self.num_classes = num_classes
        self.reg_max = reg_max
        self.nms_cfg = dict(score_threshold=score_threshold,
                            nms_threshold=nms_threshold,
                            nms_top_k=nms_top_k, keep_top_k=keep_top_k)

    def head_outputs(self, images):
        outs = self.head(self.neck(self.backbone(images)))
        return outs, tuple(o[0].shape[1:3] for o in outs)

    def _flatten(self, outs, feat_hws):
        n = outs[0][0].shape[0]
        cls = jnp.concatenate(
            [o[0].reshape(n, -1, self.num_classes) for o in outs],
            1).astype(jnp.float32)
        dist = jnp.concatenate(
            [o[1].reshape(n, -1, 4 * (self.reg_max + 1)) for o in outs],
            1).astype(jnp.float32)
        points, strides = _points(feat_hws)
        d = integral(dist, self.reg_max) * jnp.asarray(strides)[None, :, None]
        boxes = distance2bbox(jnp.asarray(points)[None], d)
        return cls, dist, boxes, points, strides

    def __call__(self, images):
        outs, feat_hws = self.head_outputs(images)
        if is_training():
            return {"outs": outs, "feat_hws": feat_hws,
                    "image_hw": images.shape[1:3]}
        cls, _, boxes, _, _ = self._flatten(outs, feat_hws)
        from ...ops.boxes import clip_boxes

        boxes = clip_boxes(boxes, images.shape[1:3])
        return multiclass_nms(boxes, jax.nn.sigmoid(cls), **self.nms_cfg)

    def loss_fn(self, outputs, targets):
        gt_boxes = targets["boxes"].astype(jnp.float32)
        gt_labels = targets["class_labels"].astype(jnp.int32)
        gt_valid = targets.get("mask")
        if gt_valid is None:
            gt_valid = (gt_boxes[..., 2] > gt_boxes[..., 0]).astype(jnp.float32)

        cls, dist, boxes, points, strides = self._flatten(
            outputs["outs"], outputs["feat_hws"])
        bsz, m = gt_valid.shape
        pm = jnp.broadcast_to(gt_valid[..., None],
                              (bsz, m, cls.shape[1])).astype(jnp.float32)
        labels, t_boxes, scores = task_aligned_assign(
            jax.lax.stop_gradient(jax.nn.sigmoid(cls)),
            jax.lax.stop_gradient(boxes), jnp.asarray(points),
            gt_labels, gt_boxes, pm, bg_index=self.num_classes,
            num_classes=self.num_classes)
        pos = labels < self.num_classes
        t = scores
        norm = jnp.maximum(t.sum(), 1.0)

        # varifocal: positives weighted by target quality, negatives by
        # alpha * p^gamma (ops.losses.varifocal_loss semantics, inlined
        # for the soft-label case)
        sig = jax.nn.sigmoid(cls)
        bce = (jnp.maximum(cls, 0) - cls * t
               + jnp.log1p(jnp.exp(-jnp.abs(cls))))
        weight = jnp.where(t > 0, t, 0.75 * sig ** 2)
        vfl_loss = (weight * bce).sum() / norm

        w = jnp.where(pos, t.max(-1), 0.0)
        giou = 1.0 - aligned_iou(boxes, t_boxes, mode="giou")
        giou_loss = (giou * w).sum() / jnp.maximum(w.sum(), 1e-6)

        st = jnp.asarray(strides)[None, :, None]
        # bin-unit targets: stride division FIRST, then clamp to the
        # distribution support (same r3 fix as gfl.py — a pixel-space
        # max_dis=reg_max clamp truncated every arm beyond 16 px)
        t_dist = bbox2distance(jnp.asarray(points)[None], t_boxes) / st
        t_dist = jnp.clip(t_dist, 0.0, self.reg_max - 0.1)
        logits = dist.reshape(dist.shape[:-1] + (4, self.reg_max + 1))
        logp = jax.nn.log_softmax(logits, -1)
        lo = jnp.floor(t_dist).astype(jnp.int32)
        hi = jnp.clip(lo + 1, 0, self.reg_max)
        wl = (lo + 1).astype(jnp.float32) - t_dist
        ce_lo = -jnp.take_along_axis(logp, lo[..., None], -1)[..., 0]
        ce_hi = -jnp.take_along_axis(logp, hi[..., None], -1)[..., 0]
        dfl = (wl * ce_lo + (1 - wl) * ce_hi).mean(-1)
        dfl_loss = (dfl * w).sum() / jnp.maximum(w.sum(), 1e-6)
        return vfl_loss + 2.0 * giou_loss + 0.25 * dfl_loss


def picodet_lcnet(num_classes=80, scale=0.75, **kwargs):
    return PicoDet(num_classes=num_classes, scale=scale, **kwargs)
