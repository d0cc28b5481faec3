"""YOLOv3 — TPU-native detection vertical.

Rebuild of reference tlxcv/models/detection/yolov3.py (YOLOv3 :23,
YoloDetBlock :122, YOLOv3FPN :186, YOLOv3Head :261, YOLOv3Loss :387,
Gt2YoloTarget :582) with the TPU-first changes from SURVEY.md §7 step 5:

- **Vectorized on-device target assignment** (:func:`gt2yolo_targets`)
  replacing the reference's per-GT host numpy loops (yolov3.py:608-684):
  one IoU-argmax + scatter per level, fully inside jit.
- Static-shape eval path: yolo_box decode + padded multiclass NMS in the
  same jit (escape #1/#2 replaced by tlxcv_tpu.ops).
- Targets are padded tensors: boxes [B, M, 4] normalized cxcywh,
  classes [B, M] int32, scores [B, M] (0 padding ⇒ invalid).
"""
from __future__ import annotations


import jax
import jax.numpy as jnp

from ... import nn
from ...core.module import is_training
from ...ops import multiclass_nms, pairwise_iou, yolo_box
from .backbones.darknet import ConvBNLayer, DarkNet

__all__ = ["YOLOv3", "YOLOv3FPN", "YOLOv3Head", "YOLOv3Loss",
           "gt2yolo_targets"]

DEFAULT_ANCHORS = ((10, 13), (16, 30), (33, 23), (30, 61), (62, 45),
                   (59, 119), (116, 90), (156, 198), (373, 326))
DEFAULT_MASKS = ((6, 7, 8), (3, 4, 5), (0, 1, 2))
DOWNSAMPLES = (32, 16, 8)


class YoloDetBlock(nn.Module):
    def __init__(self, ch_in, channel):
        assert channel % 2 == 0
        defs = [(ch_in, channel, 1), (channel, channel * 2, 3),
                (channel * 2, channel, 1), (channel, channel * 2, 3),
                (channel * 2, channel, 1)]
        self.conv_module = nn.Sequential(*[
            ConvBNLayer(ci, co, k, padding=(k - 1) // 2) for ci, co, k in defs])
        self.tip = ConvBNLayer(channel, channel * 2, 3, padding=1)

    def __call__(self, x):
        route = self.conv_module(x)
        return route, self.tip(route)


class YOLOv3FPN(nn.Module):
    """Top-down FPN; upsample is 2x nearest (escape #4 → ops.interpolate)."""

    def __init__(self, in_channels=(256, 512, 1024)):
        self.num_blocks = len(in_channels)
        self.yolo_blocks = []
        self.routes = []
        self.out_channels = []
        for i, ch in enumerate(reversed(in_channels)):
            if i > 0:
                ch += 512 // (2 ** i)
            channel = 512 // (2 ** i)
            self.yolo_blocks.append(YoloDetBlock(ch, channel))
            self.out_channels.append(channel * 2)
            if i < self.num_blocks - 1:
                self.routes.append(ConvBNLayer(channel, channel // 2, 1))

    def __call__(self, feats):
        feats = feats[::-1]  # deepest first
        outs = []
        route = None
        for i, x in enumerate(feats):
            if i > 0:
                x = jnp.concatenate([route, x], axis=-1)
            route, tip = self.yolo_blocks[i](x)
            outs.append(tip)
            if i < self.num_blocks - 1:
                route = self.routes[i](route)
                n, h, w, c = route.shape
                route = jax.image.resize(route, (n, h * 2, w * 2, c), "nearest")
        return outs


class YOLOv3Head(nn.Module):
    def __init__(self, in_channels=(1024, 512, 256), anchors=DEFAULT_ANCHORS,
                 anchor_masks=DEFAULT_MASKS, num_classes=80,
                 iou_aware=False, iou_aware_factor=0.4):
        """``iou_aware`` adds one IoU-prediction channel per anchor
        (first in the channel block, reference yolov3.py:281,:355-376);
        at eval the objectness is recombined as
        obj^(1-f) * ioup^f (de-sigmoided)."""
        self.num_classes = num_classes
        self.iou_aware = iou_aware
        self.iou_aware_factor = iou_aware_factor
        self.anchors = [[tuple(anchors[i]) for i in mask] for mask in anchor_masks]
        self.mask_anchors = [sum(([*anchors[i]] for i in mask), [])
                             for mask in anchor_masks]
        # small normal init on the prediction convs, NOT kaiming fan_out:
        # with ~24 output channels fan_out gives std~0.29 -> preact std
        # ~4.6 at 1024 input channels, saturating the obj/cls sigmoids at
        # init (the r2 detection-head bug class; fixture plateaued at
        # mAP75 .60 while mAP50 hit .87)
        from ...core import init as I
        self.yolo_outputs = [
            nn.Conv2d(ch, len(m) * (num_classes + 5)
                      + (len(m) if iou_aware else 0), 1,
                      w_init=lambda s: I.normal(s, std=0.01))
            for ch, m in zip(in_channels, anchor_masks)]

    def split_ioup(self, out, level):
        """[B, H, W, na + na*(5+nc)] -> (ioup [B, H, W, na], rest)."""
        na = len(self.anchors[level])
        return out[..., :na], out[..., na:]

    def recombine_iou_aware(self, out, level):
        """Eval-time objectness recombination (reference :355-376)."""
        if not self.iou_aware:
            return out
        na = len(self.anchors[level])
        ioup, x = self.split_ioup(out, level)
        b, h, w, _ = x.shape
        x = x.reshape(b, h, w, na, -1)
        obj = jax.nn.sigmoid(x[..., 4])
        iou_p = jax.nn.sigmoid(ioup)
        f = self.iou_aware_factor
        obj_t = jnp.clip(obj ** (1 - f) * iou_p ** f, 1e-7, 1 - 1e-7)
        obj_logit = jnp.log(obj_t) - jnp.log1p(-obj_t)  # de-sigmoid
        x = jnp.concatenate([x[..., :4], obj_logit[..., None], x[..., 5:]],
                            -1)
        return x.reshape(b, h, w, -1)

    def __call__(self, feats):
        return [conv(f) for conv, f in zip(self.yolo_outputs, feats)]


# --------------------------------------------------------------------------
# Vectorized target assignment (replaces Gt2YoloTarget host loops)
# --------------------------------------------------------------------------
def gt2yolo_targets(gt_boxes, gt_class, gt_score, anchors, anchor_masks,
                    downsamples, input_hw, num_classes, iou_thresh=1.0):
    """Assign each GT to its best-IoU anchor and stamp per-level targets.

    Args:
      gt_boxes: [B, M, 4] normalized (cx, cy, w, h); zero-area = padding.
      gt_class: [B, M] int32.
      gt_score: [B, M] float (0 => invalid).
      iou_thresh: < 1 additionally stamps every same-level anchor whose
        wh-IoU with the GT exceeds it (reference Gt2YoloTarget
        yolov3.py:654-670; the PPYOLO multi-anchor-positive recipe).
    Returns:
      list per level of [B, gh, gw, na, 6+nc] targets
      (tx, ty, tw, th, tscale, tobj, onehot-class) — the sequential
      semantics of reference Gt2YoloTarget (yolov3.py:628-672) expressed
      as a lax.scan over the (padded, small) GT axis: later GTs
      DETERMINISTICALLY overwrite earlier ones in a shared best slot
      (a one-shot scatter with duplicate indices is unspecified in XLA),
      and extra-anchor stamps never overwrite an occupied slot.

    Deviation from the reference (documented): tx/ty are clamped to
    [0, 1].  The reference bins cells with round(gx*(grid_w-1)) but
    computes tx = gx*grid_w - gi, which lands outside [0, 1] for ~25% of
    center positions — BCE against an out-of-range soft target has a
    gradient bounded away from zero and drives the logit to -inf.
    """
    h, w = input_hw
    anchors = jnp.asarray(anchors, jnp.float32)  # [A, 2] pixels
    an_hw = anchors / jnp.asarray([w, h], jnp.float32)

    gx, gy = gt_boxes[..., 0], gt_boxes[..., 1]
    gw, gh = gt_boxes[..., 2], gt_boxes[..., 3]
    valid = (gw > 0) & (gh > 0) & (gt_score > 0)            # [B, M]

    # wh-only IoU against all anchors: [B, M, A]
    inter = (jnp.minimum(gw[..., None], an_hw[None, None, :, 0]) *
             jnp.minimum(gh[..., None], an_hw[None, None, :, 1]))
    union = (gw * gh)[..., None] + an_hw[:, 0] * an_hw[:, 1] - inter
    wh_iou = inter / (union + 1e-9)
    best_idx = jnp.argmax(wh_iou, axis=-1)                  # [B, M]

    b, m = gt_boxes.shape[:2]
    bidx = jnp.arange(b)
    onehot = jax.nn.one_hot(gt_class, num_classes, dtype=jnp.float32)
    tscale = 2.0 - gw * gh

    targets = []
    for mask, ds in zip(anchor_masks, downsamples):
        grid_h, grid_w = round(h / ds), round(w / ds)
        mask_arr = jnp.asarray(mask)
        na = len(mask)
        in_level = best_idx[..., None] == mask_arr          # [B, M, na]
        best_n = jnp.argmax(in_level, axis=-1)              # [B, M]
        assigned = in_level.any(-1) & valid

        gi = jnp.round(gx * (grid_w - 1)).astype(jnp.int32)
        gj = jnp.round(gy * (grid_h - 1)).astype(jnp.int32)
        tx = jnp.clip(gx * grid_w - gi, 0.0, 1.0)
        ty = jnp.clip(gy * grid_h - gj, 0.0, 1.0)
        # per-slot tw/th: each level anchor has its own log target
        aw_n = anchors[mask_arr][:, 0]                      # [na]
        ah_n = anchors[mask_arr][:, 1]
        tw_n = jnp.log(jnp.maximum(gw * w, 1e-9)[..., None] / aw_n)
        th_n = jnp.log(jnp.maximum(gh * h, 1e-9)[..., None] / ah_n)
        base = jnp.stack([tx, ty], -1)                      # [B, M, 2]
        vals_n = jnp.concatenate([
            jnp.broadcast_to(base[:, :, None, :], (b, m, na, 2)),
            tw_n[..., None], th_n[..., None],
            jnp.broadcast_to(tscale[:, :, None, None], (b, m, na, 1)),
            jnp.broadcast_to(gt_score[:, :, None, None], (b, m, na, 1)),
            jnp.broadcast_to(onehot[:, :, None, :], (b, m, na, num_classes)),
        ], -1)                                              # [B, M, na, C]
        level_iou = wh_iou[..., mask_arr]                   # [B, M, na]
        extra_ok = (valid[..., None] & (level_iou > iou_thresh)
                    & (mask_arr[None, None, :] != best_idx[..., None]))

        gic = jnp.clip(gi, 0, grid_w - 1)
        gjc = jnp.clip(gj, 0, grid_h - 1)

        def step(tgt, g):
            gj_b = jnp.where(assigned[:, g], gj[:, g], grid_h)
            tgt = tgt.at[bidx, gj_b, gi[:, g], best_n[:, g]].set(
                vals_n[bidx, g, best_n[:, g]], mode="drop")
            if iou_thresh < 1.0:                            # static branch
                for n in range(na):
                    occupied = tgt[bidx, gjc[:, g], gic[:, g], n, 5] > 0
                    ok = extra_ok[:, g, n] & ~occupied
                    gj_e = jnp.where(ok, gj[:, g], grid_h)
                    tgt = tgt.at[bidx, gj_e, gi[:, g], n].set(
                        vals_n[:, g, n], mode="drop")
            return tgt, None

        tgt0 = jnp.zeros((b, grid_h, grid_w, na, 6 + num_classes),
                         jnp.float32)
        tgt, _ = jax.lax.scan(step, tgt0, jnp.arange(m))
        targets.append(tgt)
    return targets


def _decode_level(txy_twh, anchors, ds, grid_hw):
    """Decode raw (x, y, w, h) logits to normalized cxcywh boxes
    (reference bbox_utils.decode_yolo:204)."""
    gh, gw = grid_hw
    x, y, tw, th = (txy_twh[..., 0], txy_twh[..., 1],
                    txy_twh[..., 2], txy_twh[..., 3])
    gx = jax.lax.broadcasted_iota(jnp.float32, (gh, gw), 1)
    gy = jax.lax.broadcasted_iota(jnp.float32, (gh, gw), 0)
    cx = (jax.nn.sigmoid(x) + gx[None, :, :, None]) / gw
    cy = (jax.nn.sigmoid(y) + gy[None, :, :, None]) / gh
    an = jnp.asarray(anchors, jnp.float32)
    # clamp: exp of an unbounded logit overflows f32 after a few optimizer
    # steps and poisons the obj-loss IoU with inf/NaN
    tw = jnp.clip(tw, -10.0, 10.0)
    th = jnp.clip(th, -10.0, 10.0)
    bw = jnp.exp(tw) * an[:, 0] / (ds * gw)
    bh = jnp.exp(th) * an[:, 1] / (ds * gh)
    return jnp.stack([cx, cy, bw, bh], -1)


class YOLOv3Loss(nn.Module):
    """Fine-grained YOLOv3 loss (reference YOLOv3Loss :387-538)."""

    def __init__(self, num_classes=80, ignore_thresh=0.7, label_smooth=False,
                 downsamples=DOWNSAMPLES):
        self.num_classes = num_classes
        self.ignore_thresh = ignore_thresh
        self.label_smooth = label_smooth
        self.downsamples = downsamples

    def __call__(self, head_outs, targets_per_level, gt_boxes, anchors,
                 ioups=None):
        total = 0.0
        for li, (p, t, anchor, ds) in enumerate(zip(
                head_outs, targets_per_level, anchors, self.downsamples)):
            ioup = None if ioups is None else ioups[li]
            total = total + self._level_loss(p, t, gt_boxes, anchor, ds,
                                             ioup=ioup)
        return total

    def _level_loss(self, p, t, gt_box, anchor, ds, ioup=None):
        b, h, w, c = p.shape
        na = len(anchor)
        p = p.reshape(b, h, w, na, -1)
        x, y, pw, ph, obj = (p[..., 0], p[..., 1], p[..., 2], p[..., 3],
                             p[..., 4])
        pcls = p[..., 5:]
        tx, ty, tw, th, tscale, tobj = (t[..., 0], t[..., 1], t[..., 2],
                                        t[..., 3], t[..., 4], t[..., 5])
        tcls = t[..., 6:]
        tscale_obj = tscale * tobj

        bce = lambda logit, label: (jnp.maximum(logit, 0) - logit * label +
                                    jnp.log1p(jnp.exp(-jnp.abs(logit))))
        # xy BCE against the fractional target, computed in LOGIT space:
        # the probability form -(t log p + (1-t) log(1-p+eps)) NaNs under
        # XLA — reassociation folds the eps guard ((1+1e-9)==1 in f32),
        # giving log(0)*0 at saturated sigmoids.  bce(logit, t) is the
        # same function, stable by construction.
        loss_xy = tscale_obj * (bce(x, tx) + bce(y, ty))
        loss_xy = loss_xy.reshape(b, -1).sum(-1).mean()
        loss_wh = tscale_obj * (jnp.abs(pw - tw) + jnp.abs(ph - th))
        loss_wh = loss_wh.reshape(b, -1).sum(-1).mean()

        # objectness with ignore mask: decoded boxes vs all GT
        pbox = _decode_level(jnp.stack([x, y, pw, ph], -1), anchor, ds, (h, w))
        pbox = pbox.reshape(b, -1, 4)
        pxyxy = jnp.concatenate([pbox[..., :2] - pbox[..., 2:] * 0.5,
                                 pbox[..., :2] + pbox[..., 2:] * 0.5], -1)
        gxyxy = jnp.concatenate([gt_box[..., :2] - gt_box[..., 2:] * 0.5,
                                 gt_box[..., :2] + gt_box[..., 2:] * 0.5], -1)
        iou = pairwise_iou(jax.lax.stop_gradient(pxyxy), gxyxy)  # [B, A, M]
        iou_max = jnp.max(iou, axis=-1)
        ignore = (iou_max <= self.ignore_thresh).astype(p.dtype)
        obj_flat = obj.reshape(b, -1)
        tobj_flat = tobj.reshape(b, -1)
        obj_mask = (tobj_flat > 0).astype(p.dtype)
        loss_obj = bce(obj_flat, obj_mask)
        loss_obj = (loss_obj * tobj_flat +
                    loss_obj * (1 - obj_mask) * ignore)
        loss_obj = loss_obj.sum(-1).mean()

        if self.label_smooth:
            delta = min(1.0 / self.num_classes, 1.0 / 40)
            tcls = jnp.where(tcls > 0, 1 - delta, delta)
        loss_cls = (bce(pcls, tcls) * tobj[..., None]).reshape(b, -1).sum(-1).mean()
        total = loss_xy + loss_wh + loss_obj + loss_cls

        if ioup is not None:
            # IoU-aware branch: BCE(ioup, IoU(pred box, target box)) at
            # positive cells (PaddleDet IouAwareLoss semantics)
            tbox = _decode_level(
                jnp.stack([jnp.log(jnp.clip(tx, 1e-7, 1 - 1e-7))
                           - jnp.log1p(-jnp.clip(tx, 1e-7, 1 - 1e-7)),
                           jnp.log(jnp.clip(ty, 1e-7, 1 - 1e-7))
                           - jnp.log1p(-jnp.clip(ty, 1e-7, 1 - 1e-7)),
                           tw, th], -1), anchor, ds, (h, w))
            pb = pbox.reshape(b, h, w, na, 4)
            inter_xy = jnp.minimum(pb[..., :2] + pb[..., 2:] / 2,
                                   tbox[..., :2] + tbox[..., 2:] / 2) - \
                jnp.maximum(pb[..., :2] - pb[..., 2:] / 2,
                            tbox[..., :2] - tbox[..., 2:] / 2)
            inter = jnp.clip(inter_xy[..., 0], 0) * jnp.clip(inter_xy[..., 1], 0)
            union = (pb[..., 2] * pb[..., 3] + tbox[..., 2] * tbox[..., 3]
                     - inter + 1e-9)
            cell_iou = jax.lax.stop_gradient(inter / union)
            loss_iou_aware = bce(ioup.reshape(b, h, w, na), cell_iou) * tobj
            total = total + loss_iou_aware.reshape(b, -1).sum(-1).mean()
        return total


class YOLOv3(nn.Module):
    """Full detector.  Train: ``loss_fn(head_outs, targets)``.
    Eval: ``__call__`` returns ``(dets [B, K, 6], counts [B])`` with rows
    [label, score, x1, y1, x2, y2] in input-image pixels."""

    def __init__(self, num_classes=80, anchors=DEFAULT_ANCHORS,
                 anchor_masks=DEFAULT_MASKS, score_threshold=0.01,
                 nms_threshold=0.5, nms_top_k=1000, keep_top_k=100,
                 use_matrix_nms=False, iou_aware=False,
                 iou_aware_factor=0.4, gt_iou_thresh=1.0):
        self.use_matrix_nms = use_matrix_nms
        # < 1 enables the reference's extra same-level anchor positives
        # (Gt2YoloTarget iou_thresh, yolov3.py:654-670)
        self.gt_iou_thresh = gt_iou_thresh
        self.backbone = DarkNet()
        self.neck = YOLOv3FPN(in_channels=self.backbone.out_channels)
        self.yolo_head = YOLOv3Head(in_channels=self.neck.out_channels,
                                    anchors=anchors, anchor_masks=anchor_masks,
                                    num_classes=num_classes,
                                    iou_aware=iou_aware,
                                    iou_aware_factor=iou_aware_factor)
        self.loss = YOLOv3Loss(num_classes=num_classes)
        self.num_classes = num_classes
        self.anchors = anchors
        self.anchor_masks = anchor_masks
        self.nms_cfg = dict(score_threshold=score_threshold,
                            nms_threshold=nms_threshold, nms_top_k=nms_top_k,
                            keep_top_k=keep_top_k)

    def head_outputs(self, images):
        return self.yolo_head(self.neck(self.backbone(images)))

    def __call__(self, images):
        outs = self.head_outputs(images)
        if is_training():
            return {"head_outs": outs, "input_hw": images.shape[1:3]}
        return self.post_process(outs, images.shape[1:3])

    def loss_fn(self, outputs, targets):
        """targets: dict with boxes [B,M,4] norm cxcywh, class_labels [B,M],
        optional scores [B,M]."""
        gt_boxes = targets["boxes"]
        gt_class = targets["class_labels"].astype(jnp.int32)
        gt_score = targets.get("scores")
        if gt_score is None:
            gt_score = (gt_boxes[..., 2] > 0).astype(jnp.float32)
        tgt = gt2yolo_targets(
            gt_boxes, gt_class, gt_score, self.anchors, self.anchor_masks,
            self.loss.downsamples, outputs["input_hw"], self.num_classes,
            iou_thresh=self.gt_iou_thresh)
        head_outs = outputs["head_outs"]
        ioups = None
        if self.yolo_head.iou_aware:
            split = [self.yolo_head.split_ioup(o, i)
                     for i, o in enumerate(head_outs)]
            ioups = [sp[0] for sp in split]
            head_outs = [sp[1] for sp in split]
        return self.loss(head_outs, tgt, gt_boxes,
                         self.yolo_head.anchors, ioups=ioups)

    def post_process(self, head_outs, input_hw):
        """On-device decode + NMS, all static shapes (BASELINE config #3)."""
        h, w = input_hw
        n = head_outs[0].shape[0]
        img_size = jnp.broadcast_to(jnp.asarray([[h, w]], jnp.int32), (n, 2))
        boxes_all, scores_all = [], []
        for li, (out, mask_anchor, ds) in enumerate(zip(
                head_outs, self.yolo_head.mask_anchors,
                self.loss.downsamples)):
            out = self.yolo_head.recombine_iou_aware(out, li)
            bx, sc = yolo_box(out, img_size, mask_anchor, self.num_classes,
                              conf_thresh=0.005, downsample_ratio=ds)
            boxes_all.append(bx)
            scores_all.append(sc)
        boxes = jnp.concatenate(boxes_all, axis=1)
        scores = jnp.concatenate(scores_all, axis=1)
        if self.use_matrix_nms:
            from ...ops.nms import matrix_nms

            return matrix_nms(boxes, scores,
                              score_threshold=self.nms_cfg["score_threshold"],
                              keep_top_k=self.nms_cfg["keep_top_k"])
        return multiclass_nms(boxes, scores, **self.nms_cfg)
