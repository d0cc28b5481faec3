"""YOLOX — anchor-free detector with a decoupled head and SimOTA.

The reference README claims yolox complete (reference README.md:113) but
ships no source; built from scratch to the Megvii/PaddleDet YOLOX spec,
TPU-first:

- CSPDarknet backbone (Focus stem expressed as a space-to-depth
  reshape — no slicing convs, XLA-friendly), SiLU everywhere, SPP
  bottleneck; PAFPN neck; decoupled cls/reg+obj head on strides 8/16/32.
- **SimOTA label assignment fully on device and static-shape**: the
  dynamic-k "top-k by cost" per GT is expressed as rank-thresholding a
  fixed top-10 candidate list (rank < dynamic_k), conflicts resolved by
  per-point min cost — no host loops, no ragged shapes.
- Loss: BCE(obj) over all points, BCE(cls) and IoU loss on positives.
- Eval: grid decode + padded multiclass NMS in one jit.

Size factories follow the depth/width multipliers: tiny .33/.375,
s .33/.50, m .67/.75, l 1/1, x 1.33/1.25.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ... import nn
from ...core import init as _I
from ...core.module import Module, is_training
from ...ops import multiclass_nms, pairwise_iou

__all__ = ["YOLOX", "YOLOXHead", "CSPDarknetX", "YOLOXPAFPN", "yolox"]

STRIDES = (8, 16, 32)
SIZES = {"yolox_nano": (0.33, 0.25), "yolox_tiny": (0.33, 0.375),
         "yolox_s": (0.33, 0.50), "yolox_m": (0.67, 0.75),
         "yolox_l": (1.0, 1.0), "yolox_x": (1.33, 1.25)}


class ConvBN(Module):
    def __init__(self, c_in, c_out, k=1, s=1):
        self.conv = nn.Conv2d(c_in, c_out, k, stride=s, padding=k // 2,
                              bias=False)
        self.bn = nn.BatchNorm(c_out)

    def __call__(self, x):
        return nn.silu(self.bn(self.conv(x)))


class Bottleneck(Module):
    def __init__(self, c, shortcut=True, expansion=0.5):
        h = int(c * expansion)
        self.cv1 = ConvBN(c, h, 1)
        self.cv2 = ConvBN(h, c, 3)
        self.shortcut = shortcut

    def __call__(self, x):
        y = self.cv2(self.cv1(x))
        return x + y if self.shortcut else y


class CSPLayer(Module):
    def __init__(self, c_in, c_out, n=1, shortcut=True, expansion=0.5):
        h = int(c_out * expansion)
        self.cv1 = ConvBN(c_in, h, 1)
        self.cv2 = ConvBN(c_in, h, 1)
        self.cv3 = ConvBN(2 * h, c_out, 1)
        self.blocks = [Bottleneck(h, shortcut, 1.0) for _ in range(n)]

    def __call__(self, x):
        a = self.cv1(x)
        for b in self.blocks:
            a = b(a)
        return self.cv3(jnp.concatenate([a, self.cv2(x)], -1))


class SPPBottleneck(Module):
    def __init__(self, c_in, c_out, ks=(5, 9, 13)):
        h = c_in // 2
        self.cv1 = ConvBN(c_in, h, 1)
        self.cv2 = ConvBN(h * (len(ks) + 1), c_out, 1)
        self.pools = [nn.MaxPool2d(k, 1, k // 2) for k in ks]

    def __call__(self, x):
        x = self.cv1(x)
        return self.cv2(jnp.concatenate([x] + [p(x) for p in self.pools], -1))


def _focus(x):
    """Space-to-depth 2x: [N,H,W,C] -> [N,H/2,W/2,4C] (the YOLOX Focus
    stem without the four strided slices — one reshape/transpose that
    XLA lowers to a layout change)."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 4 * c)


class CSPDarknetX(Module):
    def __init__(self, depth_mul=1.0, width_mul=1.0):
        def w(c):
            return max(int(c * width_mul), 8)

        def d(n):
            return max(round(n * depth_mul), 1)

        self.stem = ConvBN(12, w(64), 3)
        self.dark2 = [ConvBN(w(64), w(128), 3, 2),
                      CSPLayer(w(128), w(128), d(3))]
        self.dark3 = [ConvBN(w(128), w(256), 3, 2),
                      CSPLayer(w(256), w(256), d(9))]
        self.dark4 = [ConvBN(w(256), w(512), 3, 2),
                      CSPLayer(w(512), w(512), d(9))]
        self.dark5 = [ConvBN(w(512), w(1024), 3, 2),
                      SPPBottleneck(w(1024), w(1024)),
                      CSPLayer(w(1024), w(1024), d(3), shortcut=False)]
        self.out_channels = (w(256), w(512), w(1024))

    def __call__(self, x):
        x = self.stem(_focus(x))
        for blk in self.dark2:
            x = blk(x)
        c3 = x
        for blk in self.dark3:
            c3 = blk(c3)
        c4 = c3
        for blk in self.dark4:
            c4 = blk(c4)
        c5 = c4
        for blk in self.dark5:
            c5 = blk(c5)
        return c3, c4, c5


class YOLOXPAFPN(Module):
    def __init__(self, in_channels, depth_mul=1.0):
        c3, c4, c5 = in_channels

        def d(n):
            return max(round(n * depth_mul), 1)

        self.reduce0 = ConvBN(c5, c4, 1)
        self.csp_td0 = CSPLayer(2 * c4, c4, d(3), shortcut=False)
        self.reduce1 = ConvBN(c4, c3, 1)
        self.csp_td1 = CSPLayer(2 * c3, c3, d(3), shortcut=False)
        self.down0 = ConvBN(c3, c3, 3, 2)
        self.csp_bu0 = CSPLayer(2 * c3, c4, d(3), shortcut=False)
        self.down1 = ConvBN(c4, c4, 3, 2)
        self.csp_bu1 = CSPLayer(2 * c4, c5, d(3), shortcut=False)
        self.out_channels = (c3, c4, c5)

    @staticmethod
    def _up(x, like):
        n, h, w, c = like.shape
        return jax.image.resize(x, (n, h, w, x.shape[-1]), "nearest")

    def __call__(self, feats):
        c3, c4, c5 = feats
        p5 = self.reduce0(c5)
        p4 = self.csp_td0(jnp.concatenate([self._up(p5, c4), c4], -1))
        p4r = self.reduce1(p4)
        p3 = self.csp_td1(jnp.concatenate([self._up(p4r, c3), c3], -1))
        n4 = self.csp_bu0(jnp.concatenate([self.down0(p3), p4r], -1))
        n5 = self.csp_bu1(jnp.concatenate([self.down1(n4), p5], -1))
        return p3, n4, n5


class YOLOXHead(Module):
    def __init__(self, in_channels, num_classes=80, feat_ch=256):
        self.stems = [ConvBN(c, feat_ch, 1) for c in in_channels]
        self.cls_convs = [[ConvBN(feat_ch, feat_ch, 3),
                           ConvBN(feat_ch, feat_ch, 3)]
                          for _ in in_channels]
        self.reg_convs = [[ConvBN(feat_ch, feat_ch, 3),
                           ConvBN(feat_ch, feat_ch, 3)]
                          for _ in in_channels]
        winit = lambda s: _I.normal(s, std=0.01)
        self.cls_preds = [nn.Conv2d(feat_ch, num_classes, 1, w_init=winit)
                          for _ in in_channels]
        self.reg_preds = [nn.Conv2d(feat_ch, 4, 1, w_init=winit)
                          for _ in in_channels]
        self.obj_preds = [nn.Conv2d(feat_ch, 1, 1, w_init=winit)
                          for _ in in_channels]
        self.num_classes = num_classes

    def __call__(self, feats):
        outs = []
        for li, f in enumerate(feats):
            s = self.stems[li](f)
            c = s
            for conv in self.cls_convs[li]:
                c = conv(c)
            r = s
            for conv in self.reg_convs[li]:
                r = conv(r)
            outs.append((self.cls_preds[li](c), self.reg_preds[li](r),
                         self.obj_preds[li](r)))
        return outs


def _grid_centers(feat_hws, strides=STRIDES, dtype=jnp.float32):
    pts, sts = [], []
    for (h, w), s in zip(feat_hws, strides):
        xs = (jnp.arange(w, dtype=dtype) + 0.5) * s
        ys = (jnp.arange(h, dtype=dtype) + 0.5) * s
        gx, gy = jnp.meshgrid(xs, ys)
        pts.append(jnp.stack([gx.reshape(-1), gy.reshape(-1)], -1))
        sts.append(jnp.full((h * w,), s, dtype))
    return jnp.concatenate(pts, 0), jnp.concatenate(sts, 0)


def simota_assign(boxes, cls_prob, obj_prob, points, strides, gt_boxes,
                  gt_labels, gt_valid, num_classes, center_radius=2.5,
                  topk=10):
    """One-image SimOTA, static shapes.

    boxes [P, 4] decoded xyxy, cls_prob [P, C], obj_prob [P],
    points/strides [P(,2)], gts padded [M, ...].
    Returns (matched_gt [P], fg [P]).
    """
    px, py = points[:, 0:1], points[:, 1:2]
    in_box = ((px > gt_boxes[None, :, 0]) & (px < gt_boxes[None, :, 2])
              & (py > gt_boxes[None, :, 1]) & (py < gt_boxes[None, :, 3]))
    cx = (gt_boxes[None, :, 0] + gt_boxes[None, :, 2]) * 0.5
    cy = (gt_boxes[None, :, 1] + gt_boxes[None, :, 3]) * 0.5
    rad = center_radius * strides[:, None]
    in_center = ((jnp.abs(px - cx) < rad) & (jnp.abs(py - cy) < rad))
    valid = gt_valid[None, :] > 0
    cand = (in_box | in_center) & valid                  # [P, M]

    iou = pairwise_iou(gt_boxes, boxes)                  # [M, P]
    iou_cost = -jnp.log(iou + 1e-8)
    p = jnp.clip(cls_prob * obj_prob[:, None], 1e-8, 1 - 1e-8)  # [P, C]
    onehot = jax.nn.one_hot(gt_labels, num_classes)      # [M, C]
    # BCE(pred, onehot) summed over classes, for every (gt, point) pair
    bce = -(onehot @ jnp.log(p).T + (1 - onehot) @ jnp.log1p(-p).T)  # [M, P]
    cost = bce + 3.0 * iou_cost + 1e5 * (~cand.T)

    # dynamic k per gt: sum of its top-10 IoUs (clipped to >=1)
    topk = min(topk, boxes.shape[0])
    iou_cand = jnp.where(cand.T, iou, 0.0)
    topk_iou = jax.lax.top_k(iou_cand, topk)[0]
    dyn_k = jnp.clip(topk_iou.sum(-1).astype(jnp.int32), 1, topk)  # [M]

    # choose each gt's dyn_k lowest-cost candidates: rank-threshold the
    # fixed top-`topk` list
    neg_cost, cand_idx = jax.lax.top_k(-cost, topk)      # [M, topk]
    ranks = jnp.arange(topk)[None, :]
    # a GT with zero (in_box|in_center) candidates must select nothing:
    # non-candidates carry the 1e5 cost inflation, so require the picked
    # entries to be true candidates (cost < 1e4) before foreground-marking
    chosen = ((ranks < dyn_k[:, None]) & valid[0][:, None]
              & (-neg_cost < 1e4))                        # [M, topk]
    # scatter into [M, P] selection matrix
    sel = jnp.zeros(cost.shape, bool)
    sel = jax.vmap(lambda s, idx, ch: s.at[idx].set(ch))(
        sel, cand_idx, chosen)

    # conflicts: a point claimed by several gts goes to the min-cost one
    claimed = sel.any(0)                                 # [P]
    best_gt = jnp.argmin(jnp.where(sel, cost, jnp.inf), 0)  # [P]
    return best_gt, claimed


class YOLOX(Module):
    def __init__(self, num_classes=80, depth_mul=1.0, width_mul=1.0,
                 score_threshold=0.01, nms_threshold=0.65, nms_top_k=1000,
                 keep_top_k=100):
        self.backbone = CSPDarknetX(depth_mul, width_mul)
        self.neck = YOLOXPAFPN(self.backbone.out_channels, depth_mul)
        self.head = YOLOXHead(self.neck.out_channels, num_classes)
        self.num_classes = num_classes
        self.nms_cfg = dict(score_threshold=score_threshold,
                            nms_threshold=nms_threshold,
                            nms_top_k=nms_top_k, keep_top_k=keep_top_k)

    def head_outputs(self, images):
        outs = self.head(self.neck(self.backbone(images)))
        return outs, tuple(o[0].shape[1:3] for o in outs)

    def _decode(self, outs, feat_hws):
        """-> boxes [N, P, 4] xyxy pixels, cls_logits [N, P, C],
        obj_logits [N, P]."""
        points, strides = _grid_centers(feat_hws)
        cls_l, reg_l, obj_l = [], [], []
        n = outs[0][0].shape[0]
        for (cls, reg, obj) in outs:
            cls_l.append(cls.reshape(n, -1, self.num_classes))
            reg_l.append(reg.reshape(n, -1, 4))
            obj_l.append(obj.reshape(n, -1))
        cls = jnp.concatenate(cls_l, 1).astype(jnp.float32)
        reg = jnp.concatenate(reg_l, 1).astype(jnp.float32)
        obj = jnp.concatenate(obj_l, 1).astype(jnp.float32)
        # grid decode: center = point + pred*stride (the +0.5 grid offset
        # is already inside `points`), size = exp(pred)*stride
        xy = points[None] + reg[..., :2] * strides[None, :, None]
        wh = jnp.exp(jnp.clip(reg[..., 2:], -10.0, 10.0)) \
            * strides[None, :, None]
        boxes = jnp.concatenate([xy - wh * 0.5, xy + wh * 0.5], -1)
        return boxes, cls, obj, points, strides

    def __call__(self, images):
        outs, feat_hws = self.head_outputs(images)
        if is_training():
            return {"outs": outs, "feat_hws": feat_hws,
                    "image_hw": images.shape[1:3]}
        boxes, cls, obj, _, _ = self._decode(outs, feat_hws)
        scores = jax.nn.sigmoid(cls) * jax.nn.sigmoid(obj)[..., None]
        return multiclass_nms(boxes, scores, **self.nms_cfg)

    def loss_fn(self, outputs, targets):
        gt_boxes = targets["boxes"].astype(jnp.float32)
        gt_labels = targets["class_labels"].astype(jnp.int32)
        gt_valid = targets.get("mask")
        if gt_valid is None:
            gt_valid = (gt_boxes[..., 2] > gt_boxes[..., 0]).astype(jnp.float32)

        boxes, cls, obj, points, strides = self._decode(
            outputs["outs"], outputs["feat_hws"])

        def per_image(bx, cl, ob, gbx, glb, gvd):
            best_gt, fg = simota_assign(
                jax.lax.stop_gradient(bx),
                jax.lax.stop_gradient(jax.nn.sigmoid(cl)),
                jax.lax.stop_gradient(jax.nn.sigmoid(ob)),
                points, strides, gbx, glb, gvd, self.num_classes)
            return best_gt, fg

        best_gt, fg = jax.vmap(per_image)(boxes, cls, obj, gt_boxes,
                                          gt_labels, gt_valid)
        num_fg = jnp.maximum(fg.sum(), 1.0)

        obj_bce = (jnp.maximum(obj, 0) - obj * fg
                   + jnp.log1p(jnp.exp(-jnp.abs(obj))))
        obj_loss = obj_bce.sum() / num_fg

        t_label = jnp.take_along_axis(gt_labels, best_gt, 1)
        onehot = jax.nn.one_hot(t_label, self.num_classes)
        cls_bce = (jnp.maximum(cls, 0) - cls * onehot
                   + jnp.log1p(jnp.exp(-jnp.abs(cls)))).sum(-1)
        cls_loss = jnp.where(fg, cls_bce, 0.0).sum() / num_fg

        t_boxes = jnp.take_along_axis(gt_boxes, best_gt[..., None], 1)
        from ...ops.boxes import aligned_iou

        iou = aligned_iou(boxes, t_boxes)
        iou_loss = jnp.where(fg, 1.0 - iou ** 2, 0.0).sum() / num_fg
        return obj_loss + cls_loss + 5.0 * iou_loss


def yolox(arch="yolox_s", num_classes=80, **kwargs):
    d, w = SIZES[arch]
    return YOLOX(num_classes=num_classes, depth_mul=d, width_mul=w, **kwargs)
