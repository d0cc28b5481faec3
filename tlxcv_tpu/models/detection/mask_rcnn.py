"""Mask R-CNN — two-stage instance segmentation (BASELINE.json config #5:
RPN, RoIAlign, box head, mask head + paste; the reference snapshot ships
no Mask R-CNN source (SURVEY.md honesty note), so this is built to the
published architecture, TPU-first).

Static shapes throughout: proposals are a fixed-size top-K set with a
validity mask, RoIAlign runs on all FPN levels with per-box level
selection by `where` (no dynamic gather-by-level), and every loss is a
masked mean over padded matches.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ... import nn
from ...core import init as I
from ...core.module import Module, is_training
from ...ops.boxes import bbox2delta, clip_boxes, delta2bbox, pairwise_iou
from ...ops.nms import nms
from ...ops.roi_align import (multilevel_roi_align,
                              paste_masks, roi_align)

__all__ = ["MaskRCNN", "FPN", "RPNHead"]


class FPN(Module):
    """Standard top-down FPN over C2..C5 -> P2..P5 (+P6 pool)."""

    def __init__(self, in_channels, out_ch=256):
        self.lateral = [nn.Conv2d(c, out_ch, 1) for c in in_channels]
        self.output = [nn.Conv2d(out_ch, out_ch, 3, padding=1)
                       for _ in in_channels]
        self.out_ch = out_ch

    def __call__(self, feats):
        from ...ops.image import upsample_add

        lats = [l(f) for l, f in zip(self.lateral, feats)]
        outs = [lats[-1]]
        for i in range(len(lats) - 2, -1, -1):
            outs.insert(0, upsample_add(outs[0], lats[i], mode="nearest"))
        ps = [conv(o) for conv, o in zip(self.output, outs)]
        p6 = nn.MaxPool2d(1, 2)(ps[-1])
        return ps + [p6]  # P2, P3, P4, P5, P6


class RPNHead(Module):
    def __init__(self, in_ch=256, num_anchors=3):
        # torchvision RPNHead convention: normal(0.01) on every conv —
        # the default kaiming fan_out on the few-output-channel
        # prediction convs (3 / 12 channels) gives weight std ~0.8 and
        # saturates the objectness sigmoids at init (the r2 pathology;
        # this head was missed in that sweep — caught by the r3
        # instance-seg accuracy bar: loss 219 at step 0, mAP 0.0).
        n01 = lambda s: I.normal(s, std=0.01)
        self.conv = nn.Conv2d(in_ch, in_ch, 3, padding=1, w_init=n01)
        self.objectness = nn.Conv2d(in_ch, num_anchors, 1, w_init=n01)
        self.deltas = nn.Conv2d(in_ch, num_anchors * 4, 1, w_init=n01)

    def __call__(self, feats):
        logits, deltas = [], []
        for f in feats:
            t = nn.relu(self.conv(f))
            b = f.shape[0]
            logits.append(self.objectness(t).reshape(b, -1))
            deltas.append(self.deltas(t).reshape(b, -1, 4))
        return jnp.concatenate(logits, 1), jnp.concatenate(deltas, 1)


def _rpn_anchors(feat_hws, strides=(4, 8, 16, 32, 64),
                 sizes=(32, 64, 128, 256, 512), ratios=(0.5, 1.0, 2.0)):
    """Host-side anchors [A, 4] xyxy + per-anchor level id."""
    out, levels = [], []
    for li, ((h, w), s, size) in enumerate(zip(feat_hws, strides, sizes)):
        ws = np.asarray([size * math.sqrt(r) for r in ratios], np.float32)
        hs = np.asarray([size / math.sqrt(r) for r in ratios], np.float32)
        cx = (np.arange(w, dtype=np.float32) + 0.5) * s
        cy = (np.arange(h, dtype=np.float32) + 0.5) * s
        cxg, cyg = np.meshgrid(cx, cy)
        centers = np.stack([cxg, cyg], -1).reshape(-1, 1, 2)
        wh = np.stack([ws, hs], -1)[None]
        boxes = np.concatenate([centers - wh / 2, centers + wh / 2], -1)
        boxes = boxes.reshape(-1, 4)
        out.append(boxes)
        levels.append(np.full((len(boxes),), li, np.int32))
    return np.concatenate(out), np.concatenate(levels)


class TwoFCHead(Module):
    def __init__(self, in_dim, hidden=1024):
        self.fc1 = nn.Linear(in_dim, hidden)
        self.fc2 = nn.Linear(hidden, hidden)

    def __call__(self, x):
        x = x.reshape(x.shape[0], x.shape[1], -1)
        return nn.relu(self.fc2(nn.relu(self.fc1(x))))


class MaskHead(Module):
    def __init__(self, in_ch=256, num_classes=80):
        self.convs = [nn.Conv2d(in_ch, in_ch, 3, padding=1)
                      for _ in range(4)]
        self.deconv = nn.ConvTranspose2d(in_ch, in_ch, 2, stride=2)
        # final per-class mask logits: few output channels -> kaiming
        # fan_out saturates the sigmoids at init (see RPNHead note)
        self.pred = nn.Conv2d(in_ch, num_classes, 1,
                              w_init=lambda s: I.normal(s, std=0.001))

    def __call__(self, x):
        """x [N, R, S, S, C] -> [N, R, 2S, 2S, num_classes]."""
        n, r = x.shape[:2]
        x = x.reshape((n * r,) + x.shape[2:])
        for conv in self.convs:
            x = nn.relu(conv(x))
        x = nn.relu(self.deconv(x))
        x = self.pred(x)
        return x.reshape((n, r) + x.shape[1:])


def _multilevel_roi_align(feats, boxes, output_size, sampling_ratio=2,
                          gather_impl="xla"):
    """RoIAlign with FPN level assignment over the flattened pyramid —
    exactly one level's worth of gathers per box (the round-1
    all-levels + one-hot-select formulation cost 4x the gather volume
    and dominated the 26 img/s profile; ops.roi_align.multilevel_roi_align)."""
    return multilevel_roi_align(feats, boxes, output_size,
                                sampling_ratio=sampling_ratio,
                                gather_impl=gather_impl)


class MaskRCNN(Module):
    def __init__(self, num_classes=80, num_proposals=256, pre_nms_top_k=512,
                 rpn_nms_thresh=0.7, box_score_thresh=0.05,
                 box_nms_thresh=0.5, detections_per_image=100,
                 mask_resolution=14, backbone=None, rpn_matrix_nms=False,
                 box_matrix_nms=False, with_mask=True,
                 mask_sampling_ratio=1, box_sampling_ratio=1,
                 gather_impl="xla"):
        self.rpn_matrix_nms = rpn_matrix_nms
        self.box_matrix_nms = box_matrix_nms
        from ..classification.resnet import ResNet

        self.backbone = backbone if backbone is not None else \
            ResNet(depth=50, num_classes=0, with_pool=False)
        self.fpn = FPN(self.backbone.feat_channels, 256)
        self.rpn_head = RPNHead(256, 3)
        self.box_roi_size = 7
        self.box_head = TwoFCHead(256 * 7 * 7, 1024)
        self.cls_score = nn.Linear(1024, num_classes + 1)
        self.bbox_pred = nn.Linear(1024, 4)  # class-agnostic regression
        self.with_mask = with_mask
        self.mask_head = MaskHead(256, num_classes) if with_mask else None
        self.num_classes = num_classes
        self.num_proposals = num_proposals
        self.pre_nms_top_k = pre_nms_top_k
        self.rpn_nms_thresh = rpn_nms_thresh
        self.box_score_thresh = box_score_thresh
        self.box_nms_thresh = box_nms_thresh
        self.detections_per_image = detections_per_image
        self.mask_resolution = mask_resolution
        # 1 sample/bin for the mask branch: the align is gather-bandwidth
        # bound (~40 GB/s effective, BENCHMARKS.md) and sr=2 quadruples
        # the fetched volume for sub-bin detail the 14->28 upsampled mask
        # head barely uses; sr=2 restores the torchvision default.
        self.mask_sampling_ratio = mask_sampling_ratio
        self.box_sampling_ratio = box_sampling_ratio
        # "pallas" routes the RoIAlign row-gathers through the DMA
        # kernel (ops/pallas/gather.py); A/B in probe_gather_kernel.py
        self.gather_impl = gather_impl
        self._anchor_cache = {}

    # ------------------------------------------------------------------
    def _anchors(self, feat_hws):
        key = tuple(feat_hws)
        if key not in self._anchor_cache:
            self._anchor_cache[key] = _rpn_anchors(feat_hws)
        return self._anchor_cache[key]

    def _proposals(self, logits, deltas, anchors, image_hw):
        """Per-image static top-K proposals: top pre_nms by objectness,
        decode, NMS (greedy scan or parallel matrix decay), pad to
        num_proposals."""
        h, w = image_hw

        def per_image(lg, dl):
            k = min(self.pre_nms_top_k, lg.shape[0])
            score, idx = jax.lax.top_k(lg, k)
            boxes = delta2bbox(dl[idx], jnp.asarray(anchors)[idx])
            boxes = clip_boxes(boxes, (h, w))
            if self.rpn_matrix_nms:
                # parallel decay: suppress by max IoU with higher-scored
                # proposals — one K x K matrix instead of a K-step scan
                iou = pairwise_iou(boxes, boxes)
                higher = score[:, None] < score[None, :]
                decay = jnp.where(higher, iou, 0.0).max(axis=1)
                decayed = jnp.where(decay > self.rpn_nms_thresh,
                                    -jnp.inf, score)
                top_s, keep = jax.lax.top_k(decayed, self.num_proposals)
                mask = top_s > -jnp.inf
            else:
                keep, mask = nms(boxes, score, self.rpn_nms_thresh,
                                 self.num_proposals)
            props = boxes[keep]
            # invalid slots collapse to a zero box
            props = jnp.where(mask[:, None], props, 0.0)
            return props, mask

        return jax.vmap(per_image)(logits, deltas)

    def forward_features(self, images):
        feats = self.fpn(self.backbone.features(images))
        logits, deltas = self.rpn_head(feats)
        feat_hws = tuple(tuple(f.shape[1:3]) for f in feats)
        anchors, _ = self._anchors(feat_hws)
        props, pmask = self._proposals(logits, deltas, anchors,
                                       images.shape[1:3])
        return feats, logits, deltas, anchors, props, pmask

    def __call__(self, images):
        feats, rpn_logits, rpn_deltas, anchors, props, pmask = \
            self.forward_features(images)
        if is_training():
            # the ROI heads run inside loss_fn on GT-augmented proposals
            # (torchvision semantics: GT boxes join the training
            # proposal set so the box/mask heads see clean positives
            # from step 0 — essential for from-scratch convergence)
            return {"feats": feats, "rpn_logits": rpn_logits,
                    "rpn_deltas": rpn_deltas, "anchors": anchors,
                    "proposals": props, "proposal_mask": pmask,
                    "image_hw": images.shape[1:3]}
        pooled = _multilevel_roi_align(feats, props, self.box_roi_size,
                                       self.box_sampling_ratio,
                                       gather_impl=self.gather_impl)
        hidden = self.box_head(pooled)
        cls_logits = self.cls_score(hidden)     # [N, R, C+1]
        box_deltas = self.bbox_pred(hidden)     # [N, R, 4]
        return self._postprocess(feats, props, pmask, cls_logits, box_deltas,
                                 images.shape[1:3])

    def _postprocess(self, feats, props, pmask, cls_logits, box_deltas,
                     image_hw):
        probs = jax.nn.softmax(cls_logits, -1)[..., :-1]  # drop background
        boxes = jax.vmap(lambda d, p: delta2bbox(d, p))(box_deltas, props)
        boxes = clip_boxes(boxes, image_hw)
        from ...ops.nms import matrix_nms, multiclass_nms

        if self.box_matrix_nms:
            # parallel decay instead of the keep_top_k-step greedy scan
            dets, counts = matrix_nms(
                boxes, jnp.where(pmask[..., None], probs, 0.0),
                score_threshold=self.box_score_thresh,
                keep_top_k=self.detections_per_image,
                pre_top_k=self.num_proposals)
        else:
            dets, counts = multiclass_nms(
                boxes, jnp.where(pmask[..., None], probs, 0.0),
                score_threshold=self.box_score_thresh,
                nms_threshold=self.box_nms_thresh,
                nms_top_k=self.num_proposals,
                keep_top_k=self.detections_per_image)
        if not self.with_mask:
            return dets, counts
        det_boxes = dets[..., 2:6]
        mask_feats = _multilevel_roi_align(feats, det_boxes,
                                           self.mask_resolution,
                                           self.mask_sampling_ratio,
                                           gather_impl=self.gather_impl)
        mask_logits = self.mask_head(mask_feats)  # [N, K, 28, 28, C]
        labels = jnp.clip(dets[..., 0].astype(jnp.int32), 0,
                          self.num_classes - 1)
        sel = jax.nn.one_hot(labels, self.num_classes)
        masks = jnp.einsum("nkhwc,nkc->nkhw", jax.nn.sigmoid(mask_logits),
                           sel)
        return dets, counts, masks

    def paste(self, masks, dets, counts, image_hw):
        """Host-callable: paste per-detection masks to image size."""
        return jax.vmap(lambda m, d: paste_masks(m, d[:, 2:6], image_hw))(
            masks, dets)

    # ------------------------------------------------------------------
    def loss_fn(self, outputs, targets):
        """targets: boxes [B, M, 4] xyxy pixels, class_labels [B, M],
        mask [B, M] validity, optional masks [B, M, H, W] binary."""
        gt_boxes = targets["boxes"]
        gt_labels = targets["class_labels"].astype(jnp.int32)
        gt_valid = targets.get("mask")
        if gt_valid is None:
            gt_valid = (gt_boxes[..., 2] > gt_boxes[..., 0]).astype(jnp.float32)

        anchors = jnp.asarray(outputs["anchors"])
        rpn_logits = outputs["rpn_logits"]
        rpn_deltas = outputs["rpn_deltas"]
        b = rpn_logits.shape[0]

        # ---- RPN matching: pos IoU>0.7 (or argmax per gt), neg <0.3
        iou = pairwise_iou(gt_boxes, jnp.broadcast_to(
            anchors, (b,) + anchors.shape))           # [B, M, A]
        iou = jnp.where(gt_valid[..., None] > 0, iou, -1.0)
        best_gt = jnp.argmax(iou, axis=1)             # [B, A]
        best_iou = jnp.max(iou, axis=1)
        pos = best_iou > 0.7
        # force each gt's best anchor positive
        gt_best_anchor = jnp.argmax(iou, axis=2)      # [B, M]
        bidx = jnp.arange(b)[:, None]
        # Padded GTs route to the out-of-range sentinel (dropped), same as
        # the box-head path below — scattering False at in-range index 0
        # could nondeterministically clear a real forced positive there.
        a_n = anchors.shape[0]
        force = jnp.zeros_like(pos).at[
            bidx, jnp.where(gt_valid > 0, gt_best_anchor, a_n)].set(
            True, mode="drop")
        pos = pos | force
        neg = (best_iou < 0.3) & ~pos

        obj_labels = pos.astype(jnp.float32)
        from ...ops.losses import binary_cross_entropy, smooth_l1_loss

        # Balanced pos/neg normalization: the anchor set is ~16k with a
        # handful of positives; a flat mean buries the positive signal
        # 1:1000 and the objectness ranking never sharpens (measured on
        # the ShapesDetection bar: mAP 0.14 after 2500 steps).  Equal
        # pos/neg means replicate torchvision's 256-anchor 1:1 sampler
        # in expectation, with static shapes.
        posf = pos.astype(jnp.float32)
        negf = neg.astype(jnp.float32)
        rpn_ce = binary_cross_entropy(rpn_logits, obj_labels,
                                      reduction="none")
        rpn_cls = 0.5 * (
            jnp.sum(rpn_ce * posf) / jnp.maximum(posf.sum(), 1.0)
            + jnp.sum(rpn_ce * negf) / jnp.maximum(negf.sum(), 1.0))

        matched = jnp.take_along_axis(gt_boxes, best_gt[..., None], 1)
        t_delta = bbox2delta(jnp.broadcast_to(anchors, (b,) + anchors.shape),
                             matched)
        rpn_reg = smooth_l1_loss(rpn_deltas, jax.lax.stop_gradient(t_delta),
                                 reduction="none").sum(-1)
        rpn_reg = jnp.sum(rpn_reg * posf) / jnp.maximum(posf.sum(), 1.0)

        # ---- GT-augmented proposals (training only): the last M slots
        # carry the GT boxes so the box/mask heads always have perfect
        # positives regardless of RPN quality (torchvision
        # RegionProposalNetwork + RoIHeads do the same by concatenation;
        # here static-shape by slot replacement).
        props = outputs["proposals"]
        pmask = outputs["proposal_mask"].astype(jnp.float32)
        m = gt_boxes.shape[1]
        r_total = props.shape[1]
        if m < r_total:
            tail = jnp.arange(r_total) >= (r_total - m)      # [R]
            gt_slot = jnp.concatenate(
                [jnp.zeros((b, r_total - m, 4), props.dtype),
                 gt_boxes.astype(props.dtype)], 1)
            gv_slot = jnp.concatenate(
                [jnp.zeros((b, r_total - m)), gt_valid.astype(jnp.float32)],
                1)
            use_gt = tail[None, :] & (gv_slot > 0)
            props = jnp.where(use_gt[..., None], gt_slot, props)
            pmask = jnp.maximum(pmask, use_gt.astype(jnp.float32))
        pooled = _multilevel_roi_align(outputs["feats"], props,
                                       self.box_roi_size,
                                       self.box_sampling_ratio,
                                       gather_impl=self.gather_impl)
        hidden = self.box_head(pooled)
        cls_logits = self.cls_score(hidden)           # [B, R, C+1]
        box_deltas = self.bbox_pred(hidden)           # [B, R, 4]

        # ---- box head matching: proposals vs gt at IoU 0.5
        piou = pairwise_iou(gt_boxes, props)          # [B, M, R]
        piou = jnp.where(gt_valid[..., None] > 0, piou, -1.0)
        p_best_gt = jnp.argmax(piou, axis=1)
        p_best_iou = jnp.max(piou, axis=1)
        fg = (p_best_iou >= 0.5) & (pmask > 0)
        # each valid GT's best proposal is always foreground (keeps the
        # box/mask heads learning before the RPN warms up)
        gt_best_prop = jnp.argmax(piou, axis=2)       # [B, M]
        r = props.shape[1]
        force_fg = jnp.zeros_like(fg).at[
            bidx, jnp.where(gt_valid > 0, gt_best_prop, r)].set(
            True, mode="drop")
        fg = fg | (force_fg & (pmask > 0))
        # their matched gt must be that gt, not the iou-argmax
        p_best_gt = p_best_gt.at[
            bidx, jnp.where(gt_valid > 0, gt_best_prop, r)].set(
            jnp.broadcast_to(jnp.arange(gt_boxes.shape[1]), gt_best_prop.shape),
            mode="drop")
        t_label = jnp.take_along_axis(gt_labels, p_best_gt, 1)
        t_label = jnp.where(fg, t_label, self.num_classes)  # background

        logp = jax.nn.log_softmax(cls_logits, -1)
        ce = -jnp.take_along_axis(logp, t_label[..., None], -1)[..., 0]
        # fg/bg balance at the torchvision RoIHeads sampling ratio (25%
        # positives in expectation), static-shape via group means
        fgw = fg.astype(jnp.float32) * pmask
        bgw = (1.0 - fg.astype(jnp.float32)) * pmask
        box_cls = (0.25 * jnp.sum(ce * fgw) / jnp.maximum(fgw.sum(), 1.0)
                   + 0.75 * jnp.sum(ce * bgw) / jnp.maximum(bgw.sum(), 1.0))

        p_matched = jnp.take_along_axis(gt_boxes, p_best_gt[..., None], 1)
        safe_props = jnp.where(
            (props[..., 2:] > props[..., :2]).all(-1, keepdims=True),
            props, props + jnp.asarray([0, 0, 1, 1], props.dtype))
        t_bdelta = bbox2delta(safe_props, p_matched)
        breg = smooth_l1_loss(box_deltas,
                              jax.lax.stop_gradient(t_bdelta),
                              reduction="none").sum(-1)
        fgf = fg.astype(jnp.float32)
        box_reg = jnp.sum(breg * fgf) / jnp.maximum(fgf.sum(), 1.0)

        total = rpn_cls + rpn_reg + box_cls + box_reg

        # ---- mask head (only when GT masks provided)
        gt_masks = targets.get("masks") if self.with_mask else None
        if gt_masks is not None:
            mask_feats = _multilevel_roi_align(outputs["feats"], props,
                                               self.mask_resolution,
                                               self.mask_sampling_ratio,
                                               gather_impl=self.gather_impl)
            mask_logits = self.mask_head(mask_feats)  # [B, R, 2S, 2S, C]
            ms2 = mask_logits.shape[2]

            # mask targets: crop each proposal's matched GT mask to the
            # proposal window at the head's output resolution — each
            # proposal's mask is treated as its own one-channel image
            def mask_targets(gmasks, boxes, idx):
                sel = jnp.take(gmasks, idx, axis=0)[..., None]  # [R, H, W, 1]
                return roi_align(sel, boxes[:, None, :], ms2)[:, 0, ..., 0]

            t_masks = jax.vmap(mask_targets)(gt_masks.astype(jnp.float32),
                                             props, p_best_gt)
            sel_cls = jax.nn.one_hot(jnp.clip(t_label, 0,
                                              self.num_classes - 1),
                                     self.num_classes)
            pred = jnp.einsum("brhwc,brc->brhw", mask_logits, sel_cls)
            mloss = binary_cross_entropy(
                pred, jax.lax.stop_gradient(t_masks > 0.5).astype(jnp.float32),
                reduction="none").mean((-1, -2))
            total = total + jnp.sum(mloss * fgf) / jnp.maximum(fgf.sum(), 1.0)
        return total
