"""PPYOLOE (reference tlxcv/models/detection/ppyoloe.py — CSPResNet :318,
CustomCSPPAN :1123, PPYOLOEHead :535, ATSSAssigner :1270,
TaskAlignedAssigner :1509) — TPU-native NHWC.

The reference assigners are already tensorized paddle; here they are
re-expressed as masked JAX ops with fully static shapes (no
`num_max_boxes` truncation — padded GTs are masked instead, so the same
jit serves every batch).  The `epoch_id < static_assigner_epoch` switch
(reference :891-914) becomes a `lax.cond`-free static python flag on the
loss call (retrace per phase, which XLA caches).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ... import nn
from ...core import init as I
from ...core.module import is_training
from ...ops import multiclass_nms, pairwise_iou
from ...ops.boxes import batch_distance2bbox

__all__ = ["PPYOLOE", "ppyoloe", "CSPResNet", "CustomCSPPAN", "PPYOLOEHead",
           "task_aligned_assign", "atss_assign"]


# ------------------------------------------------------------------ blocks
class ConvBNLayer(nn.Module):
    def __init__(self, ch_in, ch_out, k=3, stride=1, groups=1, padding=0,
                 act="swish"):
        self.conv = nn.Conv2d(ch_in, ch_out, k, stride=stride, padding=padding,
                              groups=groups, bias=False)
        self.bn = nn.BatchNorm(ch_out)
        self.act = nn.get_activation(act)

    def __call__(self, x):
        return self.act(self.bn(self.conv(x)))


class RepVggBlock(nn.Module):
    def __init__(self, ch_in, ch_out, act="relu"):
        self.conv1 = ConvBNLayer(ch_in, ch_out, 3, padding=1, act=None)
        self.conv2 = ConvBNLayer(ch_in, ch_out, 1, padding=0, act=None)
        self.act = nn.get_activation(act)

    def __call__(self, x):
        return self.act(self.conv1(x) + self.conv2(x))


class BasicBlock(nn.Module):
    def __init__(self, ch_in, ch_out, act="relu", shortcut=True):
        self.conv1 = ConvBNLayer(ch_in, ch_out, 3, padding=1, act=act)
        self.conv2 = RepVggBlock(ch_out, ch_out, act=act)
        self.shortcut = shortcut

    def __call__(self, x):
        y = self.conv2(self.conv1(x))
        return x + y if self.shortcut else y


class EffectiveSELayer(nn.Module):
    def __init__(self, channels):
        self.fc = nn.Conv2d(channels, channels, 1)

    def __call__(self, x):
        se = jnp.mean(x, axis=(1, 2), keepdims=True)
        return x * nn.hardsigmoid(self.fc(se))


class CSPResStage(nn.Module):
    def __init__(self, ch_in, ch_out, n, stride, act="relu", attn=True):
        ch_mid = (ch_in + ch_out) // 2
        self.conv_down = (ConvBNLayer(ch_in, ch_mid, 3, 2, padding=1, act=act)
                          if stride == 2 else None)
        self.conv1 = ConvBNLayer(ch_mid, ch_mid // 2, 1, act=act)
        self.conv2 = ConvBNLayer(ch_mid, ch_mid // 2, 1, act=act)
        self.blocks = nn.Sequential(*[
            BasicBlock(ch_mid // 2, ch_mid // 2, act=act) for _ in range(n)])
        self.attn = EffectiveSELayer(ch_mid) if attn else None
        self.conv3 = ConvBNLayer(ch_mid, ch_out, 1, act=act)

    def __call__(self, x):
        if self.conv_down is not None:
            x = self.conv_down(x)
        y = jnp.concatenate([self.conv1(x), self.blocks(self.conv2(x))], -1)
        if self.attn is not None:
            y = self.attn(y)
        return self.conv3(y)


class CSPResNet(nn.Module):
    def __init__(self, layers=(3, 6, 6, 3), channels=(64, 128, 256, 512, 1024),
                 act="swish", return_idx=(1, 2, 3), use_large_stem=True,
                 width_mult=1.0, depth_mult=1.0):
        channels = [max(round(c * width_mult), 1) for c in channels]
        layers = [max(round(l * depth_mult), 1) for l in layers]
        c0 = channels[0]
        stem = [ConvBNLayer(3, c0 // 2, 3, 2, padding=1, act=act)]
        if use_large_stem:
            stem.append(ConvBNLayer(c0 // 2, c0 // 2, 3, 1, padding=1, act=act))
        stem.append(ConvBNLayer(c0 // 2, c0, 3, 1, padding=1, act=act))
        self.stem = nn.Sequential(*stem)
        self.stages = [CSPResStage(channels[i], channels[i + 1], layers[i], 2,
                                   act=act) for i in range(len(channels) - 1)]
        self.return_idx = tuple(return_idx)
        self.out_channels = [channels[i + 1] for i in self.return_idx]

    def __call__(self, x):
        x = self.stem(x)
        outs = []
        for i, st in enumerate(self.stages):
            x = st(x)
            if i in self.return_idx:
                outs.append(x)
        return outs


class SPP(nn.Module):
    def __init__(self, ch_in, ch_out, k, pool_sizes=(5, 9, 13), act="swish"):
        self.pools = [nn.MaxPool2d(ps, 1, ps // 2) for ps in pool_sizes]
        self.conv = ConvBNLayer(ch_in, ch_out, k, padding=k // 2, act=act)

    def __call__(self, x):
        outs = [x] + [p(x) for p in self.pools]
        return self.conv(jnp.concatenate(outs, -1))


class CSPStage(nn.Module):
    def __init__(self, ch_in, ch_out, n, act="swish", spp=False):
        ch_mid = int(ch_out // 2)
        self.conv1 = ConvBNLayer(ch_in, ch_mid, 1, act=act)
        self.conv2 = ConvBNLayer(ch_in, ch_mid, 1, act=act)
        convs = []
        next_ch = ch_mid
        for i in range(n):
            convs.append(BasicBlock(next_ch, ch_mid, act=act, shortcut=False))
            if i == (n - 1) // 2 and spp:
                convs.append(SPP(ch_mid * 4, ch_mid, 1, act=act))
            next_ch = ch_mid
        self.convs = convs
        self.conv3 = ConvBNLayer(ch_mid * 2, ch_out, 1, act=act)

    def __call__(self, x):
        y1 = self.conv1(x)
        y2 = self.conv2(x)
        for c in self.convs:
            y2 = c(y2)
        return self.conv3(jnp.concatenate([y1, y2], -1))


class CustomCSPPAN(nn.Module):
    """PAN neck (reference :1123), deepest-first in/out ordering."""

    def __init__(self, in_channels=(256, 512, 1024),
                 out_channels=(768, 384, 192), act="swish", stage_num=1,
                 block_num=3, spp=True, width_mult=1.0, depth_mult=1.0):
        out_channels = [max(round(c * width_mult), 1) for c in out_channels]
        block_num = max(round(block_num * depth_mult), 1)
        in_channels = list(in_channels[::-1])  # deepest first
        self.fpn_stages = []
        self.fpn_routes = []
        ch_pre = 0
        fpn_out = []
        for i, ch_in in enumerate(in_channels):
            if i > 0:
                ch_in += ch_pre // 2
            stage = [CSPStage(ch_in, out_channels[i], block_num, act=act,
                              spp=(spp and i == 0))]
            self.fpn_stages.append(nn.Sequential(*stage))
            if i < len(in_channels) - 1:
                self.fpn_routes.append(ConvBNLayer(
                    out_channels[i], out_channels[i] // 2, 1, act=act))
            ch_pre = out_channels[i]
            fpn_out.append(out_channels[i])

        pan_out = [fpn_out[-1]]
        self.pan_stages = []
        self.pan_routes = []
        for i in reversed(range(len(in_channels) - 1)):
            self.pan_routes.append(ConvBNLayer(
                pan_out[-1], pan_out[-1], 3, 2, padding=1, act=act))
            ch_in = pan_out[-1] + fpn_out[i]
            self.pan_stages.append(CSPStage(ch_in, fpn_out[i], block_num,
                                            act=act))
            pan_out.append(fpn_out[i])
        self.out_channels = pan_out[::-1]  # deepest first

    def __call__(self, feats):
        feats = feats[::-1]
        fpn_feats = []
        route = None
        for i, feat in enumerate(feats):
            if i > 0:
                feat = jnp.concatenate([route, feat], -1)
            feat = self.fpn_stages[i](feat)
            fpn_feats.append(feat)
            if i < len(feats) - 1:
                route = self.fpn_routes[i](feat)
                n, h, w, c = route.shape
                route = jax.image.resize(route, (n, h * 2, w * 2, c), "nearest")
        pan_feats = [fpn_feats[-1]]
        route = fpn_feats[-1]
        for i in reversed(range(len(feats) - 1)):
            block = self.pan_stages[len(feats) - 2 - i]
            down = self.pan_routes[len(feats) - 2 - i](route)
            route = block(jnp.concatenate([down, fpn_feats[i]], -1))
            pan_feats.append(route)
        return pan_feats[::-1]  # shallow (stride 8) ... no: deepest first


# ------------------------------------------------------------- assignment
def check_points_inside(points, bboxes, eps=1e-9):
    """points [A, 2], bboxes [B, M, 4] -> [B, M, A] bool-ish float."""
    x, y = points[:, 0], points[:, 1]
    l = x[None, None, :] - bboxes[..., 0:1]
    t = y[None, None, :] - bboxes[..., 1:2]
    r = bboxes[..., 2:3] - x[None, None, :]
    b = bboxes[..., 3:4] - y[None, None, :]
    return (jnp.minimum(jnp.minimum(l, t), jnp.minimum(r, b)) > eps
            ).astype(jnp.float32)


def _resolve_conflicts(mask_positive, ious):
    """Anchors matched to >1 GT keep only the max-IoU GT
    (reference compute_max_iou_anchor :1770).

    The reference REPLACES the conflicted column with the argmax one-hot
    outright (ppyoloe.py:1437-1441) — intersecting with mask_positive
    would zero the whole column whenever the raw-IoU argmax is a GT that
    failed the top-k (crowded scenes), silently training the anchor as
    background."""
    matched = mask_positive.sum(axis=-2, keepdims=True)  # [B, 1, A]
    max_iou_gt = jax.nn.one_hot(jnp.argmax(ious, axis=-2),
                                ious.shape[-2], axis=-2, dtype=ious.dtype)
    return jnp.where(matched > 1, max_iou_gt, mask_positive)


def _gather_assignments(mask_positive, ious, gt_labels, gt_bboxes, bg_index,
                        num_classes):
    b, m, a = mask_positive.shape
    assigned_gt = jnp.argmax(mask_positive, axis=-2)       # [B, A]
    has_pos = mask_positive.sum(-2) > 0                    # [B, A]
    bidx = jnp.arange(b)[:, None]
    labels = gt_labels[bidx, assigned_gt]
    labels = jnp.where(has_pos, labels, bg_index)
    bboxes = gt_bboxes[bidx, assigned_gt]
    return labels.astype(jnp.int32), bboxes, has_pos, assigned_gt


def atss_assign(anchors, num_anchors_list, gt_labels, gt_bboxes, pad_gt_mask,
                bg_index, num_classes, pred_bboxes=None, topk=9, eps=1e-9):
    """ATSS (reference ATSSAssigner :1270): per-level top-k by center
    distance, threshold = mean+std of candidate IoUs."""
    anchors = jnp.asarray(anchors)
    b, m = gt_labels.shape[:2]
    a = anchors.shape[0]
    centers = (anchors[:, :2] + anchors[:, 2:]) * 0.5

    ious = pairwise_iou(gt_bboxes, jnp.broadcast_to(anchors, (b, a, 4)))
    gt_centers = (gt_bboxes[..., :2] + gt_bboxes[..., 2:]) * 0.5
    dist = jnp.linalg.norm(gt_centers[:, :, None, :] - centers[None, None],
                           axis=-1)  # [B, M, A]

    # per-level top-k closest candidates
    is_topk = jnp.zeros((b, m, a), jnp.float32)
    start = 0
    for na in num_anchors_list:
        d = dist[..., start:start + na]
        k = min(topk, na)
        thresh = jnp.sort(d, axis=-1)[..., k - 1:k]  # kth smallest distance
        sel = (d <= thresh).astype(jnp.float32)
        is_topk = is_topk.at[..., start:start + na].set(sel)
        start += na
    candidate_ious = jnp.where(is_topk > 0, ious, 0.0)
    n_cand = jnp.maximum(is_topk.sum(-1, keepdims=True), 1)
    iou_mean = candidate_ious.sum(-1, keepdims=True) / n_cand
    iou_var = (jnp.where(is_topk > 0,
                         (candidate_ious - iou_mean) ** 2, 0.0)
               .sum(-1, keepdims=True) / n_cand)
    iou_thresh = iou_mean + jnp.sqrt(iou_var + eps)

    inside = check_points_inside(centers, gt_bboxes)
    mask_positive = ((ious >= iou_thresh).astype(jnp.float32) * is_topk *
                     inside * pad_gt_mask)
    mask_positive = _resolve_conflicts(mask_positive, ious)
    labels, bboxes, has_pos, assigned_gt = _gather_assignments(
        mask_positive, ious, gt_labels, gt_bboxes, bg_index, num_classes)

    scores = jax.nn.one_hot(labels, num_classes + 1)[..., :num_classes]
    if pred_bboxes is not None:
        pred_iou = pairwise_iou(gt_bboxes, pred_bboxes)  # [B, M, A]
        iou_a = (pred_iou * mask_positive).max(-2)        # [B, A]
        scores = scores * iou_a[..., None]
    return labels, bboxes, scores


def task_aligned_assign(pred_scores, pred_bboxes, anchor_points,
                        gt_labels, gt_bboxes, pad_gt_mask, bg_index,
                        num_classes, topk=13, alpha=1.0, beta=6.0, eps=1e-9):
    """TaskAligned (reference TaskAlignedAssigner :1509)."""
    b, m = gt_labels.shape[:2]
    a = pred_scores.shape[1]
    ious = pairwise_iou(gt_bboxes, pred_bboxes)  # [B, M, A]
    # score of each anchor for the gt's class
    scores_t = jnp.transpose(pred_scores, (0, 2, 1))  # [B, C, A]
    bidx = jnp.broadcast_to(jnp.arange(b)[:, None], (b, m))
    cls_scores = scores_t[bidx, gt_labels]  # [B, M, A]
    alignment = (cls_scores ** alpha) * (ious ** beta)

    inside = check_points_inside(anchor_points, gt_bboxes)
    metric = alignment * inside
    k = min(topk, a)
    # Reference gather_topk_anchors(:1700) is called with
    # topk_mask=pad_gt_mask: every REAL gt keeps its top-k candidates
    # REGARDLESS of metric magnitude.  A `metric > eps` cutoff is NOT
    # reference behavior and is catastrophic: cls^1 * iou^6 underflows
    # 1e-9 at cold start (score 1e-3, iou 0.1), every positive vanishes,
    # and the cls loss then trains all scores to zero (observed: the
    # two-phase sweep collapsed to loss 5e-4 / mAP 0.0 after the switch).
    _, topk_idxs = jax.lax.top_k(metric, k)                  # [B, M, k]
    # top_k indices are distinct, so the one-hot sum is already 0/1 (the
    # reference's duplicate guard existed only because it zeroed masked
    # indices to 0, creating collisions); padded gts are masked below
    is_topk = jax.nn.one_hot(topk_idxs, a, dtype=jnp.float32).sum(-2)
    mask_positive = is_topk * inside * pad_gt_mask
    mask_positive = _resolve_conflicts(mask_positive, ious)
    labels, bboxes, has_pos, assigned_gt = _gather_assignments(
        mask_positive, ious, gt_labels, gt_bboxes, bg_index, num_classes)

    # normalized alignment scores
    alignment = alignment * mask_positive
    max_align = alignment.max(-1, keepdims=True)
    max_iou = (ious * mask_positive).max(-1, keepdims=True)
    norm_align = (alignment / (max_align + eps) * max_iou).max(-2)  # [B, A]
    scores = jax.nn.one_hot(labels, num_classes + 1)[..., :num_classes]
    return labels, bboxes, scores * norm_align[..., None]


# ------------------------------------------------------------------- head
class ESEAttn(nn.Module):
    def __init__(self, feat_channels, act="swish"):
        self.fc = nn.Conv2d(feat_channels, feat_channels, 1,
                            w_init=lambda s: I.normal(s, std=0.001))
        self.conv = ConvBNLayer(feat_channels, feat_channels, 1, act=act)

    def __call__(self, feat, avg_feat):
        return self.conv(feat * nn.sigmoid(self.fc(avg_feat)))


class PPYOLOEHead(nn.Module):
    def __init__(self, in_channels=(1024, 512, 256), num_classes=80,
                 act="swish", fpn_strides=(32, 16, 8), grid_cell_scale=5.0,
                 grid_cell_offset=0.5, reg_max=16, static_assigner_epoch=4,
                 use_varifocal_loss=True,
                 loss_weight={"class": 1.0, "iou": 2.5, "dfl": 0.5},
                 nms_cfg=None):
        self.num_classes = num_classes
        self.fpn_strides = tuple(fpn_strides)
        self.grid_cell_scale = grid_cell_scale
        self.grid_cell_offset = grid_cell_offset
        self.reg_max = reg_max
        self.static_assigner_epoch = static_assigner_epoch
        self.use_varifocal_loss = use_varifocal_loss
        self.loss_weight = dict(loss_weight)
        self.nms_cfg = nms_cfg or dict(score_threshold=0.01,
                                       nms_threshold=0.6, nms_top_k=1000,
                                       keep_top_k=100)
        bias_cls = float(-math.log((1 - 0.01) / 0.01))
        self.stem_cls = [ESEAttn(c, act=act) for c in in_channels]
        self.stem_reg = [ESEAttn(c, act=act) for c in in_channels]
        self.pred_cls = [
            nn.Conv2d(c, num_classes, 3, padding=1,
                      w_init=lambda s: I.zeros(s),
                      b_init=lambda s: I.constant(s, bias_cls))
            for c in in_channels]
        self.pred_reg = [
            nn.Conv2d(c, 4 * (reg_max + 1), 3, padding=1,
                      w_init=lambda s: I.zeros(s),
                      b_init=lambda s: I.ones(s))
            for c in in_channels]

    # -- anchors (host-side numpy, static per feat shapes) --
    def _anchors(self, feat_hws):
        pts, strs, anchors, counts = [], [], [], []
        for (h, w), s in zip(feat_hws, self.fpn_strides):
            xs = (np.arange(w, dtype=np.float32) + self.grid_cell_offset) * s
            ys = (np.arange(h, dtype=np.float32) + self.grid_cell_offset) * s
            xg, yg = np.meshgrid(xs, ys)
            c = np.stack([xg, yg], -1).reshape(-1, 2).astype(np.float32)
            pts.append(c)  # pixel-space anchor centers
            strs.append(np.full((h * w, 1), s, np.float32))
            half = self.grid_cell_scale * s * 0.5
            anchors.append(np.concatenate([c - half, c + half], -1))
            counts.append(h * w)
        return (np.concatenate(anchors), np.concatenate(pts),
                np.concatenate(strs), counts)

    def __call__(self, feats):
        cls_list, reg_list = [], []
        for i, feat in enumerate(feats):
            b = feat.shape[0]
            avg = jnp.mean(feat, axis=(1, 2), keepdims=True)
            cls_logit = self.pred_cls[i](self.stem_cls[i](feat, avg) + feat)
            reg_dist = self.pred_reg[i](self.stem_reg[i](feat, avg))
            cls_list.append(nn.sigmoid(cls_logit).reshape(b, -1, self.num_classes))
            reg_list.append(reg_dist.reshape(b, -1, 4 * (self.reg_max + 1)))
        feat_hws = [f.shape[1:3] for f in feats]
        return (jnp.concatenate(cls_list, 1), jnp.concatenate(reg_list, 1),
                feat_hws)

    def _bbox_decode(self, anchor_points, pred_dist):
        b, l, _ = pred_dist.shape
        d = jax.nn.softmax(pred_dist.reshape(b, l, 4, self.reg_max + 1), -1)
        proj = jnp.arange(self.reg_max + 1, dtype=jnp.float32)
        dist = jnp.einsum("blfr,r->blf", d, proj)
        return batch_distance2bbox(anchor_points, dist)

    def _df_loss(self, pred_dist, target):
        tl = jnp.floor(target).astype(jnp.int32)
        tr = tl + 1
        wl = tr.astype(jnp.float32) - target
        wr = 1.0 - wl
        logp = jax.nn.log_softmax(pred_dist, -1)
        ll = -jnp.take_along_axis(logp, tl[..., None], -1)[..., 0] * wl
        lr = -jnp.take_along_axis(logp, tr[..., None], -1)[..., 0] * wr
        return jnp.mean(ll + lr, -1)

    def get_loss(self, head_outs, targets, epoch_id=0):
        pred_scores, pred_distri, feat_hws = head_outs
        anchors, points, strides, counts = self._anchors(feat_hws)
        points_s = points / strides
        pred_bboxes = self._bbox_decode(points_s, pred_distri)

        gt_labels = targets["class_labels"].astype(jnp.int32)
        gt_bboxes = targets["boxes"]  # [B, M, 4] xyxy input pixels
        pad_mask = targets.get("pad_gt_mask")
        if pad_mask is None:
            pad_mask = (gt_bboxes[..., 2] > gt_bboxes[..., 0]).astype(jnp.float32)
        if pad_mask.ndim == 3:
            pad_mask = pad_mask[..., 0]
        bsz, m = pad_mask.shape
        pm = jnp.broadcast_to(pad_mask[..., None],
                              (bsz, m, pred_scores.shape[1]))

        # Assigner inputs MUST be detached (reference wraps them in
        # tlx.convert_to_tensor at :904, a graph break; upstream paddle
        # assigners run under @no_grad).  Without stop_gradient the VFL
        # loss minimizes itself through its own targets: for p < 0.5,
        # dCE/dtarget = log((1-p)/p) > 0, so the optimizer shrinks
        # alignment (= score * iou^6) to zero — observed as the r4
        # post-switch collapse (loss 0.98 -> 0.003 in 300 steps, mAP 0;
        # TOOD/PicoDet/YOLOX/GFL already detach and never collapsed).
        det_scores = jax.lax.stop_gradient(pred_scores)
        det_bboxes = jax.lax.stop_gradient(pred_bboxes)
        if epoch_id < self.static_assigner_epoch:
            labels, bboxes, scores = atss_assign(
                anchors, counts, gt_labels, gt_bboxes, pm,
                bg_index=self.num_classes, num_classes=self.num_classes,
                pred_bboxes=det_bboxes * strides)
        else:
            labels, bboxes, scores = task_aligned_assign(
                det_scores, det_bboxes * strides, jnp.asarray(points),
                gt_labels, gt_bboxes, pm, bg_index=self.num_classes,
                num_classes=self.num_classes)
        bboxes = bboxes / strides

        one_hot = jax.nn.one_hot(labels, self.num_classes + 1)[..., :-1]
        # clip instead of +eps guards: XLA reassociation folds
        # `1 - p + 1e-9` to `log(0)` at saturated sigmoids (see yolov3.py)
        eps = 1e-6
        pred_scores = jnp.clip(pred_scores, eps, 1.0 - eps)
        if self.use_varifocal_loss:
            weight = 0.75 * (pred_scores ** 2.0) * (1 - one_hot) + scores * one_hot
        else:
            weight = (pred_scores - scores) ** 2.0
        ce = -(scores * jnp.log(pred_scores) +
               (1 - scores) * jnp.log(1 - pred_scores))
        loss_cls = jnp.sum(ce * weight)
        scores_sum = jnp.maximum(jnp.sum(scores), 1.0)
        loss_cls = loss_cls / scores_sum

        pos = (labels != self.num_classes).astype(jnp.float32)  # [B, A]
        bbox_w = jnp.sum(scores, -1) * pos
        from ...ops.boxes import aligned_iou

        giou = 1.0 - aligned_iou(pred_bboxes, bboxes, mode="giou")
        loss_iou = jnp.sum(giou * bbox_w) / scores_sum

        ltrb = jnp.clip(jnp.concatenate([
            points_s - bboxes[..., :2], bboxes[..., 2:] - points_s], -1),
            0, self.reg_max - 0.01)
        b, a = pos.shape
        pd = pred_distri.reshape(b, a, 4, self.reg_max + 1)
        dfl = self._df_loss(pd, ltrb)
        loss_dfl = jnp.sum(dfl * bbox_w) / scores_sum

        return (self.loss_weight["class"] * loss_cls +
                self.loss_weight["iou"] * loss_iou +
                self.loss_weight["dfl"] * loss_dfl)

    def post_process(self, head_outs, input_hw=None):
        pred_scores, pred_distri, feat_hws = head_outs
        _, points, strides, _ = self._anchors(feat_hws)
        boxes = self._bbox_decode(points / strides, pred_distri) * strides
        return multiclass_nms(boxes, pred_scores, **self.nms_cfg)


class PPYOLOE(nn.Module):
    def __init__(self, backbone, neck, head):
        self.backbone = backbone
        self.neck = neck
        self.yolo_head = head

    def __call__(self, images, epoch_id=0):
        feats = self.neck(self.backbone(images))
        outs = self.yolo_head(feats)
        if is_training():
            return {"head_outs": outs, "epoch_id": epoch_id}
        return self.yolo_head.post_process(outs)

    def loss_fn(self, outputs, targets):
        return self.yolo_head.get_loss(outputs["head_outs"], targets,
                                       outputs.get("epoch_id", 0))


def ppyoloe(arch="ppyoloe_l", num_classes=80, **kwargs):
    mults = {"ppyoloe_s": (0.33, 0.50), "ppyoloe_m": (0.67, 0.75),
             "ppyoloe_l": (1.0, 1.0), "ppyoloe_x": (1.33, 1.25)}
    if arch not in mults:
        raise ValueError(f"unsupported arch {arch}")
    depth_mult, width_mult = mults[arch]
    backbone = CSPResNet(width_mult=width_mult, depth_mult=depth_mult)
    neck = CustomCSPPAN(in_channels=backbone.out_channels,
                        width_mult=width_mult, depth_mult=depth_mult)
    head = PPYOLOEHead(in_channels=neck.out_channels,
                       num_classes=num_classes, **kwargs)
    return PPYOLOE(backbone, neck, head)
