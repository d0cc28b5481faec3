"""TTFNet — Training-Time-Friendly Network (gaussian-region GIoU).

The reference README claims TTFNet complete (reference README.md:126)
but ships no source; built from scratch to the PaddleDet
ttfnet_darknet53 spec, TPU-first:

- DarkNet-53 backbone (reused from the YOLOv3 vertical), upsample neck
  to stride 4 with lateral shortcut convs.
- Heads: CenterNet-style focal heatmap [C]; wh head predicts 4 ltrb
  distances (x ``wh_offset_base``), supervised with **GIoU over the
  whole gaussian ellipse region** — every pixel in the region regresses
  the box, weighted by its (normalized) gaussian value.
- All targets stamped vectorized on device: per-pixel best-GT selection
  is an argmax over the per-GT gaussian maps ([H, W, M] broadcast under
  vmap), no host loops.
- Decode: identical peak-picking path as CenterNet but boxes come from
  the ltrb distances directly (no offset head needed).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ... import nn
from ...core import init as _I
from ...core.module import Module, is_training
from ...ops.boxes import aligned_iou

__all__ = ["TTFNet", "ttfnet_darknet53"]


class _UpBlock(Module):
    def __init__(self, c_in, c_out, c_lateral):
        self.up = nn.ConvTranspose2d(c_in, c_out, 4, stride=2, padding=1,
                                     bias=False)
        self.bn = nn.BatchNorm(c_out)
        self.lat = nn.Conv2d(c_lateral, c_out, 1, bias=False)
        self.lat_bn = nn.BatchNorm(c_out)

    def __call__(self, x, lateral):
        return nn.relu(self.bn(self.up(x))
                       + self.lat_bn(self.lat(lateral)))


class _Head(Module):
    def __init__(self, c_in, mid, c_out, bias_val=0.0):
        self.conv = nn.Conv2d(c_in, mid, 3, padding=1)
        self.pred = nn.Conv2d(mid, c_out, 1,
                              w_init=lambda s: _I.normal(s, std=0.01),
                              b_init=lambda s: jnp.full(s, bias_val))

    def __call__(self, x):
        return self.pred(nn.relu(self.conv(x)))


class TTFNet(Module):
    def __init__(self, num_classes=80, backbone=None, down_ratio=4,
                 wh_offset_base=16.0, alpha=0.54, top_k=100,
                 score_threshold=0.01, hm_weight=1.0, wh_weight=5.0):
        if backbone is None:
            from .backbones.darknet import DarkNet

            backbone = DarkNet()
        self.backbone = backbone
        chans = backbone.out_channels          # e.g. (256, 512, 1024) s8/16/32
        self.up1 = _UpBlock(chans[2], 256, chans[1])   # s32 -> s16
        self.up2 = _UpBlock(256, 128, chans[0])        # s16 -> s8
        self.up3 = nn.ConvTranspose2d(128, 64, 4, stride=2, padding=1,
                                      bias=False)      # s8 -> s4
        self.up3_bn = nn.BatchNorm(64)
        prior = -math.log((1 - 0.01) / 0.01)
        self.hm_head = _Head(64, 128, num_classes, bias_val=prior)
        self.wh_head = _Head(64, 64, 4)
        self.num_classes = num_classes
        self.down_ratio = down_ratio
        self.wh_offset_base = wh_offset_base
        self.alpha = alpha
        self.top_k = top_k
        self.score_threshold = score_threshold
        self.hm_weight = hm_weight
        self.wh_weight = wh_weight

    def head_outputs(self, images):
        c3, c4, c5 = self.backbone(images)
        x = self.up1(c5, c4)
        x = self.up2(x, c3)
        x = nn.relu(self.up3_bn(self.up3(x)))
        return self.hm_head(x), self.wh_head(x)

    def _decode_boxes(self, wh):
        """[N, H, W, 4] relu'd ltrb (x base) -> per-pixel xyxy pixels."""
        n, h, w, _ = wh.shape
        d = nn.relu(wh.astype(jnp.float32)) * self.wh_offset_base
        gx = (jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) + 0.5) \
            * self.down_ratio
        gy = (jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) + 0.5) \
            * self.down_ratio
        return jnp.stack([gx[None] - d[..., 0], gy[None] - d[..., 1],
                          gx[None] + d[..., 2], gy[None] + d[..., 3]], -1)

    def __call__(self, images):
        hm, wh = self.head_outputs(images)
        if is_training():
            return {"hm": hm, "wh": wh, "image_hw": images.shape[1:3]}
        return self.decode(hm, wh)

    def decode(self, hm, wh):
        n, h, w, c = hm.shape
        prob = jax.nn.sigmoid(hm.astype(jnp.float32))
        pooled = nn.MaxPool2d(3, 1, 1)(prob)
        peaks = jnp.where(prob >= pooled, prob, 0.0)
        scores, idx = jax.lax.top_k(peaks.reshape(n, -1), self.top_k)
        cls = (idx % c).astype(jnp.float32)
        pix = idx // c
        boxes = self._decode_boxes(wh).reshape(n, -1, 4)
        bx = jnp.take_along_axis(boxes, pix[..., None], 1)
        valid = scores > self.score_threshold
        dets = jnp.concatenate([cls[..., None], scores[..., None], bx], -1)
        dets = jnp.where(valid[..., None], dets,
                         jnp.asarray([-1, 0, 0, 0, 0, 0], dets.dtype))
        return dets, valid.sum(-1)

    # -- training ------------------------------------------------------
    def _targets(self, gt_boxes, gt_labels, gt_valid, hw):
        h, w = hw
        r = self.down_ratio

        def per_image(boxes, labels, valid):
            bx = boxes / r
            cx = (bx[:, 0] + bx[:, 2]) * 0.5
            cy = (bx[:, 1] + bx[:, 3]) * 0.5
            bw = jnp.maximum(bx[:, 2] - bx[:, 0], 1e-3)
            bh = jnp.maximum(bx[:, 3] - bx[:, 1], 1e-3)
            sx = jnp.maximum(self.alpha * bw / 6.0, 1e-3)
            sy = jnp.maximum(self.alpha * bh / 6.0, 1e-3)
            gx = jnp.arange(w, dtype=jnp.float32)[None, :, None]
            gy = jnp.arange(h, dtype=jnp.float32)[:, None, None]
            g = jnp.exp(-(((gx - cx[None, None]) ** 2 / (2 * sx ** 2))
                          + ((gy - cy[None, None]) ** 2 / (2 * sy ** 2))))
            # normalize each GT's gaussian to peak EXACTLY 1 on the
            # grid: the analytic peak sits at the continuous center, so
            # the nearest pixel's value can be well below 1 for small
            # boxes and `pos = hm_t >= 1-1e-4` would select NOTHING —
            # the heatmap then trains with zero positive supervision
            # (r3 sweep: loss fell to 0.16 with fixture mAP 0.012).
            g = g / jnp.maximum(g.max((0, 1), keepdims=True), 1e-6)
            g = jnp.where(valid[None, None] > 0, g, 0.0)      # [H, W, M]
            onehot = jax.nn.one_hot(labels, self.num_classes)
            hm_t = jnp.einsum("hwm,mc->hwmc", g, onehot).max(2)

            # per-pixel owning GT: highest gaussian value (zero = none)
            own = jnp.argmax(g, -1)                           # [H, W]
            wmax = jnp.max(g, -1)
            box_t = boxes[own]                                # [H, W, 4]
            # normalize each GT's weights so every box contributes
            # equally regardless of area (the TTFNet recipe)
            gsum = jnp.where(jax.nn.one_hot(own, g.shape[-1]) > 0,
                             wmax[..., None], 0.0).sum((0, 1))  # [M]
            norm = jnp.where(valid > 0, 1.0 / jnp.maximum(gsum, 1e-6), 0.0)
            wgt = wmax * norm[own] * jnp.where(valid[own] > 0, 1.0, 0.0)
            wgt = jnp.where(wmax > 1e-4, wgt, 0.0)
            return hm_t, box_t, wgt

        return jax.vmap(per_image)(gt_boxes, gt_labels, gt_valid)

    def loss_fn(self, outputs, targets):
        gt_boxes = targets["boxes"].astype(jnp.float32)
        gt_labels = targets["class_labels"].astype(jnp.int32)
        gt_valid = targets.get("mask")
        if gt_valid is None:
            gt_valid = (gt_boxes[..., 2] > gt_boxes[..., 0]).astype(jnp.float32)

        hm = outputs["hm"].astype(jnp.float32)
        n, h, w, c = hm.shape
        hm_t, box_t, wgt = self._targets(gt_boxes, gt_labels, gt_valid,
                                         (h, w))
        prob = jnp.clip(jax.nn.sigmoid(hm), 1e-6, 1 - 1e-6)
        pos = hm_t >= 1.0 - 1e-4
        num_pos = jnp.maximum(gt_valid.sum(), 1.0)
        pos_loss = jnp.where(pos, -((1 - prob) ** 2) * jnp.log(prob), 0.0)
        neg_loss = jnp.where(~pos, -((1 - hm_t) ** 4) * (prob ** 2)
                             * jnp.log(1 - prob), 0.0)
        hm_loss = (pos_loss.sum() + neg_loss.sum()) / num_pos

        pred_boxes = self._decode_boxes(outputs["wh"])
        giou = 1.0 - aligned_iou(pred_boxes, box_t, mode="giou")
        wh_loss = (giou * wgt).sum() / jnp.maximum(wgt.sum(), 1e-6)
        return self.hm_weight * hm_loss + self.wh_weight * wh_loss


def ttfnet_darknet53(num_classes=80, **kwargs):
    return TTFNet(num_classes=num_classes, **kwargs)
