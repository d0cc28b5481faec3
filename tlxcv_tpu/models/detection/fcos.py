"""FCOS — anchor-free single-stage detector, TPU-native.

The reference README claims fcos_r50/fcos_dcn complete
(reference README.md:114-115) but ships no source; BASELINE.json's
north star names FCOS explicitly.  This is a from-scratch TPU-first
build to the PaddleDet fcos_r50_fpn_1x_coco spec:

- P3-P7 FPN (strides 8..128), shared 4-conv GN towers, per-level
  learnable scales, centerness on the regression tower,
  ``norm_reg_targets`` semantics (head emits stride-normalized
  distances; decode multiplies by stride).
- **Fully vectorized on-device target assignment** (no host loops):
  center sampling (radius 1.5 strides), per-level regression ranges,
  min-area tie-break — one [P, M] tensor pass per image under vmap.
- Loss: sigmoid focal (cls) + centerness-weighted GIoU (box) + BCE
  (centerness), normalized the FCOS way.
- Eval: per-level decode + padded multiclass NMS in the same jit
  (static shapes; score = cls * centerness).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ... import nn
from ...core import init as _I
from ...core.module import Module, Param, is_training
from ...ops import multiclass_nms
from ...ops.boxes import distance2bbox
from ...ops.losses import sigmoid_focal_loss

__all__ = ["FCOS", "FCOSHead", "FPNP3P7", "fcos_r50", "fcos_targets"]

STRIDES = (8, 16, 32, 64, 128)
# max-regression-distance range per level (the FCOS paper / PaddleDet
# object_sizes_of_interest)
LEVEL_RANGES = ((-1, 64), (64, 128), (128, 256), (256, 512), (512, 1e8))


class FPNP3P7(Module):
    """C3-C5 laterals -> P3-P5, plus stride-2 convs for P6/P7 (on P5,
    per FCOS; RetinaNet puts them on C5 — see retinanet.py)."""

    def __init__(self, in_channels, out_ch=256, extra_on_input=False):
        self.lateral = [nn.Conv2d(c, out_ch, 1) for c in in_channels]
        self.output = [nn.Conv2d(out_ch, out_ch, 3, padding=1)
                       for _ in in_channels]
        self.extra_on_input = extra_on_input
        p6_in = in_channels[-1] if extra_on_input else out_ch
        self.p6 = nn.Conv2d(p6_in, out_ch, 3, stride=2, padding=1)
        self.p7 = nn.Conv2d(out_ch, out_ch, 3, stride=2, padding=1)

    def __call__(self, feats):
        """feats: [C3, C4, C5] NHWC -> [P3..P7]."""
        lat = [l(f) for l, f in zip(self.lateral, feats)]
        for i in range(len(lat) - 1, 0, -1):
            n, h, w, c = lat[i - 1].shape
            up = jax.image.resize(lat[i], (n, h, w, c), "nearest")
            lat[i - 1] = lat[i - 1] + up
        outs = [conv(l) for conv, l in zip(self.output, lat)]
        p6 = self.p6(feats[-1] if self.extra_on_input else outs[-1])
        p7 = self.p7(nn.relu(p6))
        return outs + [p6, p7]


class _Scale(Module):
    def __init__(self, value=1.0):
        self.scale = Param(jnp.asarray(value, jnp.float32))

    def __call__(self, x):
        return x * self.scale.value.astype(x.dtype)


class FCOSHead(Module):
    """Shared towers over all levels; per-level reg scale."""

    def __init__(self, in_ch=256, num_classes=80, num_convs=4,
                 num_levels=len(STRIDES), prior_prob=0.01, dcn_last=False):
        def tower():
            convs = []
            for i in range(num_convs):
                if dcn_last and i == num_convs - 1:
                    from .deform import DeformConv2d

                    convs.append(DeformConv2d(in_ch, in_ch))
                else:
                    convs.append(nn.Conv2d(
                        in_ch, in_ch, 3, padding=1,
                        w_init=lambda s: _I.normal(s, std=0.01)))
                convs.append(nn.GroupNorm(32, in_ch))
            return convs

        self.cls_tower = tower()
        self.reg_tower = tower()
        bias = -math.log((1 - prior_prob) / prior_prob)
        # detection-head convention: normal(0.01) weights — kaiming
        # fan_out on 1-4 output channels gives std ~0.5 and saturates
        # every sigmoid at init (measured: centerness BCE 85 at step 0)
        self.cls_pred = nn.Conv2d(in_ch, num_classes, 3, padding=1,
                                  w_init=lambda s: _I.normal(s, std=0.01),
                                  b_init=lambda s: jnp.full(s, bias))
        self.reg_pred = nn.Conv2d(in_ch, 4, 3, padding=1,
                                  w_init=lambda s: _I.normal(s, std=0.01))
        self.ctr_pred = nn.Conv2d(in_ch, 1, 3, padding=1,
                                  w_init=lambda s: _I.normal(s, std=0.01))
        self.scales = [_Scale() for _ in range(num_levels)]
        self.num_classes = num_classes

    @staticmethod
    def _run_tower(tower, x):
        for i in range(0, len(tower), 2):
            x = nn.relu(tower[i + 1](tower[i](x)))
        return x

    def __call__(self, feats):
        """-> per level (cls_logits [N,H,W,C], reg [N,H,W,4] in
        stride-normalized units, ctr_logits [N,H,W,1])."""
        outs = []
        for li, f in enumerate(feats):
            c = self._run_tower(self.cls_tower, f)
            r = self._run_tower(self.reg_tower, f)
            reg = nn.relu(self.scales[li](self.reg_pred(r)))
            outs.append((self.cls_pred(c), reg, self.ctr_pred(r)))
        return outs


def _level_points(feat_hws, strides=STRIDES, dtype=jnp.float32):
    """Per level [H*W, 2] (x, y) centers in input pixels."""
    pts = []
    for (h, w), s in zip(feat_hws, strides):
        ys = (jnp.arange(h, dtype=dtype) + 0.5) * s
        xs = (jnp.arange(w, dtype=dtype) + 0.5) * s
        gx, gy = jnp.meshgrid(xs, ys)
        pts.append(jnp.stack([gx.reshape(-1), gy.reshape(-1)], -1))
    return pts


def fcos_targets(points, point_strides, point_ranges, gt_boxes, gt_labels,
                 gt_valid, num_classes, center_radius=1.5):
    """Vectorized FCOS assignment for ONE image.

    points [P, 2], point_strides [P], point_ranges [P, 2];
    gt_boxes [M, 4] xyxy pixels, gt_labels [M], gt_valid [M].
    Returns (cls_tgt [P] int32 in [0..C] with C = background,
             ltrb [P, 4] pixel distances, ctr_tgt [P], pos_mask [P]).
    """
    px = points[:, 0:1]                                  # [P, 1]
    py = points[:, 1:2]
    l = px - gt_boxes[None, :, 0]                        # [P, M]
    t = py - gt_boxes[None, :, 1]
    r = gt_boxes[None, :, 2] - px
    b = gt_boxes[None, :, 3] - py
    ltrb = jnp.stack([l, t, r, b], -1)                   # [P, M, 4]
    inside = ltrb.min(-1) > 0

    # center sampling: point within radius*stride of the gt center
    cx = (gt_boxes[None, :, 0] + gt_boxes[None, :, 2]) * 0.5
    cy = (gt_boxes[None, :, 1] + gt_boxes[None, :, 3]) * 0.5
    rad = center_radius * point_strides[:, None]
    near = ((jnp.abs(px - cx) <= rad) & (jnp.abs(py - cy) <= rad))

    # level range on the max regression distance
    max_d = ltrb.max(-1)
    in_range = ((max_d >= point_ranges[:, 0:1])
                & (max_d <= point_ranges[:, 1:2]))

    cand = inside & near & in_range & (gt_valid[None, :] > 0)
    area = ((gt_boxes[:, 2] - gt_boxes[:, 0])
            * (gt_boxes[:, 3] - gt_boxes[:, 1]))         # [M]
    area_c = jnp.where(cand, area[None, :], jnp.inf)
    best = jnp.argmin(area_c, -1)                        # [P]
    pos = jnp.isfinite(area_c.min(-1))

    take = lambda x: jnp.take_along_axis(x, best[:, None, None]
                                         if x.ndim == 3 else best[:, None],
                                         axis=1).squeeze(1)
    ltrb_t = take(ltrb)                                  # [P, 4]
    cls_t = jnp.where(pos, gt_labels[best], num_classes).astype(jnp.int32)
    lr = jnp.stack([ltrb_t[:, 0], ltrb_t[:, 2]], -1)
    tb = jnp.stack([ltrb_t[:, 1], ltrb_t[:, 3]], -1)
    ctr = jnp.sqrt(jnp.clip(
        (lr.min(-1) / jnp.maximum(lr.max(-1), 1e-6))
        * (tb.min(-1) / jnp.maximum(tb.max(-1), 1e-6)), 0.0, 1.0))
    return cls_t, ltrb_t, jnp.where(pos, ctr, 0.0), pos


class FCOS(Module):
    """Full detector.  Eval returns ``(dets [B, K, 6], counts [B])``
    rows [label, score, x1, y1, x2, y2] (the framework's NMS layout)."""

    def __init__(self, num_classes=80, backbone=None, score_threshold=0.025,
                 nms_threshold=0.6, nms_top_k=1000, keep_top_k=100,
                 dcn_last=False):
        from ..classification.resnet import ResNet

        self.backbone = backbone if backbone is not None else \
            ResNet(depth=50, num_classes=0, with_pool=False)
        self.neck = FPNP3P7(self.backbone.feat_channels[1:], 256)
        self.head = FCOSHead(256, num_classes, dcn_last=dcn_last)
        self.num_classes = num_classes
        self.nms_cfg = dict(score_threshold=score_threshold,
                            nms_threshold=nms_threshold,
                            nms_top_k=nms_top_k, keep_top_k=keep_top_k)

    def head_outputs(self, images):
        c3, c4, c5 = self.backbone.features(images)[1:]
        feats = self.neck([c3, c4, c5])
        return self.head(feats), tuple(f.shape[1:3] for f in feats)

    def __call__(self, images):
        outs, feat_hws = self.head_outputs(images)
        if is_training():
            return {"outs": outs, "feat_hws": feat_hws,
                    "image_hw": images.shape[1:3]}
        return self.post_process(outs, feat_hws, images.shape[1:3])

    # -- eval ----------------------------------------------------------
    def post_process(self, outs, feat_hws, image_hw):
        pts = _level_points(feat_hws)
        boxes_l, scores_l = [], []
        for (cls, reg, ctr), p, s in zip(outs, pts, STRIDES):
            n = cls.shape[0]
            c = cls.shape[-1]
            cls = cls.reshape(n, -1, c)
            reg = reg.reshape(n, -1, 4).astype(jnp.float32) * s
            ctr = ctr.reshape(n, -1, 1)
            boxes = distance2bbox(p[None], reg, max_shape=image_hw)
            boxes_l.append(boxes)
            scores_l.append(jax.nn.sigmoid(cls) * jax.nn.sigmoid(ctr))
        boxes = jnp.concatenate(boxes_l, 1)
        scores = jnp.concatenate(scores_l, 1).astype(jnp.float32)
        return multiclass_nms(boxes, scores, **self.nms_cfg)

    # -- train ---------------------------------------------------------
    def loss_fn(self, outputs, targets):
        """targets: boxes [B, M, 4] xyxy pixels, class_labels [B, M],
        optional mask [B, M]."""
        gt_boxes = targets["boxes"].astype(jnp.float32)
        gt_labels = targets["class_labels"].astype(jnp.int32)
        gt_valid = targets.get("mask")
        if gt_valid is None:
            gt_valid = (gt_boxes[..., 2] > gt_boxes[..., 0]).astype(jnp.float32)

        outs = outputs["outs"]
        feat_hws = outputs["feat_hws"]
        pts = _level_points(feat_hws)
        strides = jnp.concatenate([
            jnp.full((p.shape[0],), s, jnp.float32)
            for p, s in zip(pts, STRIDES)])
        ranges = jnp.concatenate([
            jnp.broadcast_to(jnp.asarray(rg, jnp.float32), (p.shape[0], 2))
            for p, rg in zip(pts, LEVEL_RANGES)])
        points = jnp.concatenate(pts, 0)

        cls_t, ltrb_t, ctr_t, pos = jax.vmap(
            lambda bx, lb, vd: fcos_targets(
                points, strides, ranges, bx, lb, vd, self.num_classes)
        )(gt_boxes, gt_labels, gt_valid)

        n = outs[0][0].shape[0]
        cls_all = jnp.concatenate(
            [o[0].reshape(n, -1, self.num_classes) for o in outs], 1)
        reg_all = jnp.concatenate(
            [o[1].reshape(n, -1, 4).astype(jnp.float32) * s
             for o, s in zip(outs, STRIDES)], 1)
        ctr_all = jnp.concatenate(
            [o[2].reshape(n, -1) for o in outs], 1).astype(jnp.float32)

        num_pos = jnp.maximum(pos.sum(), 1.0)
        onehot = jax.nn.one_hot(cls_t, self.num_classes, dtype=jnp.float32)
        cls_loss = sigmoid_focal_loss(
            cls_all.astype(jnp.float32), onehot).sum() / num_pos

        pred_boxes = distance2bbox(points[None], reg_all)
        tgt_boxes = distance2bbox(points[None], ltrb_t)
        from ...ops.boxes import aligned_iou

        giou = 1.0 - aligned_iou(pred_boxes, tgt_boxes, mode="giou")
        w = jnp.where(pos, ctr_t, 0.0)
        box_loss = (giou * w).sum() / jnp.maximum(w.sum(), 1e-6)

        ctr_bce = (jnp.maximum(ctr_all, 0) - ctr_all * ctr_t
                   + jnp.log1p(jnp.exp(-jnp.abs(ctr_all))))
        ctr_loss = jnp.where(pos, ctr_bce, 0.0).sum() / num_pos
        return cls_loss + box_loss + ctr_loss


def fcos_r50(num_classes=80, **kwargs):
    return FCOS(num_classes=num_classes, **kwargs)


def fcos_dcn_r50(num_classes=80, **kwargs):
    """FCOS with modulated deformable convs on the head towers' last
    layer (TPU-sane DCN placement — see detection.deform)."""
    return FCOS(num_classes=num_classes, dcn_last=True, **kwargs)
