"""SOLOv2 — box-free instance segmentation with dynamic mask kernels.

The reference README claims SOLOv2 complete (reference README.md:122)
but ships no source; built from scratch to the PaddleDet
solov2_r50_fpn_1x spec, TPU-first:

- ResNet-50 + P2-P6 FPN (reused from the Mask R-CNN vertical); per-level
  category branch and **kernel branch with CoordConv** on grid sizes
  (40, 36, 24, 16, 12); a fused stride-4 mask-feature branch.
- Dynamic convolution is a single matmul: mask features [HW, E] @
  gathered kernels [E, K] -> K instance masks (MXU-native; the CUDA
  dynamic-conv op the GPU implementations need simply disappears).
- **Static-shape training**: instead of ragged per-image positive
  lists, the assignment produces a dense cell->GT map (center-region
  rectangles + sqrt-area level ranges, all tensor ops) and a fixed
  ``max_pos`` slots of positive cells are selected by top-k for the
  dice loss — padded, masked, jit-stable.
- Eval: top-k candidate cells -> dynamic conv -> **mask-IoU matrix
  NMS** (ops.nms-style parallel decay; mask IoU is one [K, K] matmul).

Returns eval tuples (labels [N,K], scores [N,K], masks [N,K,H/4,W/4],
counts [N]).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ... import nn
from ...core import init as _I
from ...core.module import Module, is_training
from .mask_rcnn import FPN

__all__ = ["SOLOv2", "solov2_r50"]

GRID_NUMS = (40, 36, 24, 16, 12)
SCALE_RANGES = ((1, 96), (48, 192), (96, 384), (192, 768), (384, 2048))
STRIDES = (8, 8, 16, 32, 32)


def _gn_conv(c_in, c_out):
    return (nn.Conv2d(c_in, c_out, 3, padding=1, bias=False),
            nn.GroupNorm(32, c_out))


class SOLOv2Head(Module):
    def __init__(self, in_ch=256, feat_ch=256, num_classes=80, kernel_ch=128,
                 num_convs=4, prior_prob=0.01):
        self.cate_convs = []
        self.kernel_convs = []
        for i in range(num_convs):
            self.cate_convs.extend(_gn_conv(in_ch if i == 0 else feat_ch,
                                            feat_ch))
            self.kernel_convs.extend(_gn_conv(
                (in_ch + 2) if i == 0 else feat_ch, feat_ch))
        bias = -math.log((1 - prior_prob) / prior_prob)
        self.cate_pred = nn.Conv2d(feat_ch, num_classes, 3, padding=1,
                                   w_init=lambda s: _I.normal(s, std=0.01),
                                   b_init=lambda s: jnp.full(s, bias))
        self.kernel_pred = nn.Conv2d(feat_ch, kernel_ch, 3, padding=1,
                                     w_init=lambda s: _I.normal(s, std=0.01))
        self.num_classes = num_classes
        self.kernel_ch = kernel_ch

    @staticmethod
    def _coord(x):
        n, h, w, c = x.shape
        gx = jax.lax.broadcasted_iota(x.dtype, (n, h, w, 1), 2) \
            / max(w - 1, 1) * 2 - 1
        gy = jax.lax.broadcasted_iota(x.dtype, (n, h, w, 1), 1) \
            / max(h - 1, 1) * 2 - 1
        return jnp.concatenate([x, gx, gy], -1)

    def __call__(self, feats):
        """feats: P2..P6; -> per level (cate [N,S,S,C], kernel [N,S,S,E])."""
        outs = []
        for li, f in enumerate(feats):
            n, h, w, c = f.shape
            s = GRID_NUMS[li]
            g = jax.image.resize(f, (n, s, s, c), "bilinear")
            cate = g
            for i in range(0, len(self.cate_convs), 2):
                cate = nn.relu(self.cate_convs[i + 1](
                    self.cate_convs[i](cate)))
            kern = self._coord(g)
            for i in range(0, len(self.kernel_convs), 2):
                kern = nn.relu(self.kernel_convs[i + 1](
                    self.kernel_convs[i](kern)))
            outs.append((self.cate_pred(cate), self.kernel_pred(kern)))
        return outs


class MaskFeat(Module):
    """Fuse P2-P5 into stride-4 mask features (with CoordConv on the
    deepest level, per the paper)."""

    def __init__(self, in_ch=256, mid=128, out_ch=128):
        self.convs = [nn.Conv2d(in_ch, mid, 3, padding=1, bias=False),
                      nn.Conv2d(in_ch, mid, 3, padding=1, bias=False),
                      nn.Conv2d(in_ch, mid, 3, padding=1, bias=False),
                      nn.Conv2d(in_ch + 2, mid, 3, padding=1, bias=False)]
        self.norms = [nn.GroupNorm(32, mid) for _ in range(4)]
        self.out = nn.Conv2d(mid, out_ch, 1, bias=False)
        self.out_norm = nn.GroupNorm(32, out_ch)

    def __call__(self, feats):
        p2, p3, p4, p5 = feats[:4]
        n, h, w, _ = p2.shape
        acc = 0.0
        for i, f in enumerate([p2, p3, p4, p5]):
            if i == 3:
                f = SOLOv2Head._coord(f)
            x = nn.relu(self.norms[i](self.convs[i](f)))
            if x.shape[1:3] != (h, w):
                x = jax.image.resize(x, (n, h, w, x.shape[-1]), "bilinear")
            acc = acc + x
        return nn.relu(self.out_norm(self.out(acc)))


class SOLOv2(Module):
    def __init__(self, num_classes=80, backbone=None, kernel_ch=128,
                 score_threshold=0.1, mask_threshold=0.5, pre_top_k=256,
                 keep_top_k=100, max_pos=64):
        from ..classification.resnet import ResNet

        self.backbone = backbone if backbone is not None else \
            ResNet(depth=50, num_classes=0, with_pool=False)
        self.fpn = FPN(self.backbone.feat_channels, 256)
        self.head = SOLOv2Head(256, 256, num_classes, kernel_ch)
        self.mask_feat = MaskFeat(256, 128, kernel_ch)
        self.num_classes = num_classes
        self.kernel_ch = kernel_ch
        self.score_threshold = score_threshold
        self.mask_threshold = mask_threshold
        self.pre_top_k = pre_top_k
        self.keep_top_k = keep_top_k
        self.max_pos = max_pos

    def head_outputs(self, images):
        feats = self.fpn(self.backbone.features(images))
        return self.head(feats), self.mask_feat(feats)

    def __call__(self, images):
        outs, mfeat = self.head_outputs(images)
        if is_training():
            return {"outs": outs, "mask_feat": mfeat,
                    "image_hw": images.shape[1:3]}
        return self.post_process(outs, mfeat)

    # -- eval ----------------------------------------------------------
    def post_process(self, outs, mfeat):
        n = mfeat.shape[0]
        cate = jnp.concatenate(
            [o[0].reshape(n, -1, self.num_classes) for o in outs],
            1).astype(jnp.float32)                       # [N, Q, C]
        kern = jnp.concatenate(
            [o[1].reshape(n, -1, self.kernel_ch) for o in outs],
            1).astype(jnp.float32)                       # [N, Q, E]

        def per_image(cate, kern, feat):
            prob = jax.nn.sigmoid(cate)
            conf = prob.max(-1)
            cls = prob.argmax(-1)
            k = min(self.pre_top_k, conf.shape[0])
            top_c, idx = jax.lax.top_k(conf, k)
            kers = kern[idx]                              # [k, E]
            h, w, e = feat.shape
            logits = feat.reshape(-1, e) @ kers.T         # [HW, k]
            masks = jax.nn.sigmoid(logits.T).reshape(k, h, w)
            binm = (masks > self.mask_threshold).astype(jnp.float32)
            area = binm.sum((1, 2))
            # maskness rescoring
            maskness = jnp.where(
                area > 0,
                (masks * binm).sum((1, 2)) / jnp.maximum(area, 1.0), 0.0)
            scores = top_c * maskness
            scores = jnp.where(scores >= self.score_threshold, scores, 0.0)
            # mask-IoU matrix NMS (parallel decay)
            flat = binm.reshape(k, -1)
            inter = flat @ flat.T
            iou = inter / jnp.maximum(
                area[:, None] + area[None, :] - inter, 1.0)
            same = cls[idx][:, None] == cls[idx][None, :]
            higher = scores[:, None] < scores[None, :]
            decay = 1.0 - jnp.where(same & higher, iou, 0.0).max(1)
            decayed = scores * decay
            kk = min(self.keep_top_k, k)
            fs, fi = jax.lax.top_k(decayed, kk)
            valid = fs > 0
            return (jnp.where(valid, cls[idx][fi], -1), fs,
                    jnp.where(valid[:, None, None], masks[fi], 0.0),
                    valid.sum())

        return jax.vmap(per_image)(cate, kern, mfeat)

    # -- train ---------------------------------------------------------
    def _assign(self, gt_boxes, gt_labels, gt_valid):
        """Dense cell->GT map per level.  Returns concat [Q] assigned gt
        (or -1), [Q, C] cate one-hot target."""
        scale = jnp.sqrt(jnp.maximum(
            (gt_boxes[:, 2] - gt_boxes[:, 0])
            * (gt_boxes[:, 3] - gt_boxes[:, 1]), 1e-6))   # [M]
        cx = (gt_boxes[:, 0] + gt_boxes[:, 2]) * 0.5
        cy = (gt_boxes[:, 1] + gt_boxes[:, 3]) * 0.5
        hw_half = jnp.stack([(gt_boxes[:, 2] - gt_boxes[:, 0]),
                             (gt_boxes[:, 3] - gt_boxes[:, 1])],
                            -1) * 0.5 * 0.2               # sigma 0.2
        h_img, w_img = self._img_hw
        assigned, cates = [], []
        for s, (lo, hi) in zip(GRID_NUMS, SCALE_RANGES):
            in_lvl = (scale >= lo) & (scale <= hi) & (gt_valid > 0)
            # grid cell centers in image coords
            xs = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s * w_img
            ys = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s * h_img
            inx = (jnp.abs(xs[:, None] - cx[None]) <=
                   jnp.maximum(hw_half[:, 0], w_img / s)[None])  # [S, M]
            iny = (jnp.abs(ys[:, None] - cy[None]) <=
                   jnp.maximum(hw_half[:, 1], h_img / s)[None])
            cell = (iny[:, None, :] & inx[None, :, :]
                    & in_lvl[None, None, :])              # [S, S, M]
            # smallest-scale GT wins a contested cell
            key = jnp.where(cell, scale[None, None, :], jnp.inf)
            best = jnp.argmin(key, -1)
            pos = jnp.isfinite(key.min(-1))
            assigned.append(jnp.where(pos, best, -1).reshape(-1))
            onehot = jax.nn.one_hot(gt_labels[best], self.num_classes)
            cates.append(jnp.where(pos[..., None], onehot,
                                   0.0).reshape(s * s, -1))
        return jnp.concatenate(assigned), jnp.concatenate(cates, 0)

    def loss_fn(self, outputs, targets):
        parts = self.loss_parts(outputs, targets)
        return parts["cate"] + 3.0 * parts["dice"]

    def loss_parts(self, outputs, targets):
        """targets: boxes [B,M,4] xyxy pixels, class_labels [B,M],
        masks [B,M,H,W] binary instance masks, optional mask [B,M]."""
        gt_boxes = targets["boxes"].astype(jnp.float32)
        gt_labels = targets["class_labels"].astype(jnp.int32)
        gt_masks = targets["masks"].astype(jnp.float32)
        gt_valid = targets.get("mask")
        if gt_valid is None:
            gt_valid = (gt_boxes[..., 2] > gt_boxes[..., 0]).astype(jnp.float32)

        self._img_hw = outputs["image_hw"]
        outs = outputs["outs"]
        mfeat = outputs["mask_feat"].astype(jnp.float32)
        n, h4, w4, e = mfeat.shape
        cate_pred = jnp.concatenate(
            [o[0].reshape(n, -1, self.num_classes) for o in outs],
            1).astype(jnp.float32)
        kern_pred = jnp.concatenate(
            [o[1].reshape(n, -1, self.kernel_ch) for o in outs],
            1).astype(jnp.float32)

        assigned, cate_t = jax.vmap(self._assign)(gt_boxes, gt_labels,
                                                  gt_valid)
        # focal cate loss
        prob = jax.nn.sigmoid(cate_pred)
        pt = jnp.where(cate_t > 0, prob, 1 - prob)
        alpha = jnp.where(cate_t > 0, 0.25, 0.75)
        focal = -alpha * (1 - pt) ** 2 * jnp.log(jnp.clip(pt, 1e-6, 1.0))
        num_pos = jnp.maximum((assigned >= 0).sum(), 1.0)
        cate_loss = focal.sum() / num_pos

        # dice loss on a fixed budget of positive cells
        small_masks = jax.image.resize(
            gt_masks, (n, gt_masks.shape[1], h4, w4), "bilinear")

        def per_image(assigned, kern, feat, gmasks):
            posf = (assigned >= 0).astype(jnp.float32)
            _, slots = jax.lax.top_k(posf, self.max_pos)
            sel_gt = assigned[slots]                      # [P]
            sel_valid = sel_gt >= 0
            kers = kern[slots]                            # [P, E]
            logits = (feat.reshape(-1, e) @ kers.T).T.reshape(
                self.max_pos, h4, w4)
            pred = jax.nn.sigmoid(logits)
            tgt = gmasks[jnp.maximum(sel_gt, 0)]
            tgt = (tgt > 0.5).astype(jnp.float32)
            inter = (pred * tgt).sum((1, 2))
            dice = 1.0 - (2 * inter + 1.0) / (
                (pred ** 2).sum((1, 2)) + (tgt ** 2).sum((1, 2)) + 1.0)
            return jnp.where(sel_valid, dice, 0.0).sum(), \
                sel_valid.sum().astype(jnp.float32)

        dsum, dcnt = jax.vmap(per_image)(assigned, kern_pred, mfeat,
                                         small_masks)
        dice_loss = dsum.sum() / jnp.maximum(dcnt.sum(), 1.0)
        return {"cate": cate_loss, "dice": dice_loss}


def solov2_r50(num_classes=80, **kwargs):
    return SOLOv2(num_classes=num_classes, **kwargs)
