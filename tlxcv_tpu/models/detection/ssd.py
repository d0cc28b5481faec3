"""SSD (reference tlxcv/models/detection/ssd.py: SSD :45, SSDHead :230,
SSDBox :325, SSDLoss :383) — TPU-native NHWC.

Changes from the reference (SURVEY.md §7):
- priors precomputed host-side per input size (static constants);
- matching + hard-negative mining fully vectorized (the reference loops
  per image for num_neg — here it's one `where`);
- decode + padded NMS inside the same jit.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ... import nn
from ...core.module import is_training
from ...ops import multiclass_nms, pairwise_iou
from ...ops.anchors import ssd_prior_box
from ..classification.mobilenetv1 import ConvBNReLU, MobileNetV1

__all__ = ["SSD", "SSDHead", "SSDLoss", "ssd_decode"]


class ExtraBlock(nn.Module):
    def __init__(self, cin, mid, cout):
        self.conv1 = ConvBNReLU(cin, mid, 1)
        self.conv2 = ConvBNReLU(mid, cout, 3, stride=2, padding=1)

    def __call__(self, x):
        return self.conv2(self.conv1(x))


class SSDMobileNetBackbone(nn.Module):
    """MobileNetV1 features at conv11 (512ch) and conv13 (1024ch) + 4 extra
    blocks (512, 256, 256, 128) — reference backbones/mobilenet_v1.py:104."""

    def __init__(self, scale=1.0):
        self.net = MobileNetV1(num_classes=0, with_pool=False, scale=scale,
                               feature_idx=(10, 12))
        self.extras = [
            ExtraBlock(1024, 256, 512), ExtraBlock(512, 128, 256),
            ExtraBlock(256, 128, 256), ExtraBlock(256, 64, 128),
        ]
        self.out_channels = (512, 1024, 512, 256, 256, 128)

    def __call__(self, x):
        feats = self.net.features(x)  # [conv11, conv13]
        x = feats[-1]
        for blk in self.extras:
            x = blk(x)
            feats.append(x)
        return feats


class SSDHead(nn.Module):
    def __init__(self, num_classes=80, in_channels=(512, 1024, 512, 256, 256, 128),
                 num_priors=(3, 6, 6, 6, 6, 6), kernel_size=1, padding=0):
        self.num_classes = num_classes + 1  # + background
        # prediction convs: small normal init, NOT kaiming fan_out — with
        # 12 output channels fan_out gives std~0.4, saturating both heads
        # at init (the r2 detection-head bug class; it-0 loss was 93.8 and
        # the fixture plateaued at mAP .23 with mAP75 .11)
        from ...core import init as I
        w = lambda s: I.normal(s, std=0.01)
        self.box_convs = [nn.Conv2d(c, p * 4, kernel_size, padding=padding,
                                    w_init=w)
                          for c, p in zip(in_channels, num_priors)]
        self.score_convs = [
            nn.Conv2d(c, p * self.num_classes, kernel_size, padding=padding,
                      w_init=w)
            for c, p in zip(in_channels, num_priors)]

    def __call__(self, feats):
        boxes, scores = [], []
        for f, bc, sc in zip(feats, self.box_convs, self.score_convs):
            b = f.shape[0]
            boxes.append(bc(f).reshape(b, -1, 4))
            scores.append(sc(f).reshape(b, -1, self.num_classes))
        return jnp.concatenate(boxes, 1), jnp.concatenate(scores, 1)


def build_ssd_priors(feature_hws, image_hw=(300, 300), min_sizes=None,
                     max_sizes=None):
    """Reference SSD-MobileNet prior config (ssd.py:64-82).

    The reference's 60..300 px sizes are the SSD-paper scale ladder
    (s = 0.2..1.0 of the input) written in absolute pixels FOR ITS
    300x300 input.  When ``image_hw != 300`` and no explicit sizes are
    given, the ladder is rescaled by ``min(image_hw)/300`` — keeping
    the paper's relative-scale semantics instead of pinning half-image
    priors onto small inputs (at 300 this is exactly the reference
    table, so 300-input parity is unchanged)."""
    if min_sizes is None:
        s = min(image_hw) / 300.0
        min_sizes = tuple(v * s for v in
                          (60.0, 105.0, 150.0, 195.0, 240.0, 285.0))
        max_sizes = tuple(v * s if v else None for v in
                          (0.0, 150.0, 195.0, 240.0, 285.0, 300.0))
    elif max_sizes is None:
        max_sizes = (None,) * len(min_sizes)
    aspect_ratios = ((2.0,), (2.0, 3.0), (2.0, 3.0), (2.0, 3.0), (2.0, 3.0),
                     (2.0, 3.0))
    out = []
    for hw, ms, mx, ar in zip(feature_hws, min_sizes, max_sizes, aspect_ratios):
        b, _ = ssd_prior_box(hw, image_hw, [ms], [mx] if mx else None, ar,
                             flip=True, clip=False,
                             min_max_aspect_ratios_order=False)
        out.append(b.reshape(-1, 4))
    return np.concatenate(out, 0)  # [A, 4] normalized xyxy


def ssd_decode(box_preds, priors, variances=(0.1, 0.1, 0.2, 0.2)):
    """Delta decode vs priors (reference SSDBox :325-381), normalized xyxy."""
    pw = priors[:, 2] - priors[:, 0]
    ph = priors[:, 3] - priors[:, 1]
    px = priors[:, 0] + pw * 0.5
    py = priors[:, 1] + ph * 0.5
    ox = px + box_preds[..., 0] * pw * variances[0]
    oy = py + box_preds[..., 1] * ph * variances[1]
    ow = jnp.exp(box_preds[..., 2] * variances[2]) * pw
    oh = jnp.exp(box_preds[..., 3] * variances[3]) * ph
    return jnp.stack([ox - ow / 2, oy - oh / 2, ox + ow / 2, oy + oh / 2], -1)


class SSDLoss(nn.Module):
    """Matching + smooth-L1 + hard-negative-mined CE
    (reference SSDLoss :383-513), fully vectorized."""

    def __init__(self, overlap_threshold=0.5, neg_pos_ratio=3.0,
                 loc_loss_weight=1.0, conf_loss_weight=1.0,
                 prior_box_var=(0.1, 0.1, 0.2, 0.2)):
        self.overlap_threshold = overlap_threshold
        self.neg_pos_ratio = neg_pos_ratio
        self.loc_loss_weight = loc_loss_weight
        self.conf_loss_weight = conf_loss_weight
        self.var = prior_box_var

    def __call__(self, boxes, scores, gt_bbox, gt_label, gt_mask, priors):
        """gt_bbox [B, N, 4] normalized xyxy; gt_label [B, N]; gt_mask [B, N]
        (1 = real GT, 0 = padding); priors [A, 4]."""
        b, a = scores.shape[:2]
        bg = scores.shape[-1] - 1

        ious = pairwise_iou(gt_bbox, jnp.broadcast_to(priors, (b,) + priors.shape))
        # padding GTs must not match anything
        ious = jnp.where(gt_mask[..., None] > 0, ious, -1.0)
        prior_max = jnp.max(ious, axis=1)        # [B, A]
        prior_arg = jnp.argmax(ious, axis=1)     # [B, A] best gt per prior
        gt_arg = jnp.argmax(ious, axis=2)        # [B, N] best prior per gt

        t_bbox = jnp.take_along_axis(gt_bbox, prior_arg[..., None], axis=1)
        t_label = jnp.take_along_axis(gt_label, prior_arg, axis=1)
        t_label = jnp.where(prior_max < self.overlap_threshold, bg, t_label)
        # force each (real) gt's best prior to match it
        batch_idx = jnp.broadcast_to(jnp.arange(b)[:, None], gt_arg.shape)
        safe_prior = jnp.where(gt_mask > 0, gt_arg, a)  # OOB for pad -> drop
        t_bbox = t_bbox.at[batch_idx, safe_prior].set(gt_bbox, mode="drop")
        t_label = t_label.at[batch_idx, safe_prior].set(gt_label, mode="drop")

        from ...ops.boxes import bbox2delta

        t_delta = bbox2delta(jnp.broadcast_to(priors, (b,) + priors.shape),
                             t_bbox, weights=[1 / v for v in self.var])
        t_delta = jax.lax.stop_gradient(t_delta)
        t_label = jax.lax.stop_gradient(t_label)

        pos = (t_label != bg).astype(jnp.float32)
        num_pos = pos.sum(axis=1, keepdims=True)

        loc_loss = jnp.where(
            pos[..., None] > 0,
            _smooth_l1(boxes, t_delta), 0.0).sum() * self.loc_loss_weight

        logp = jax.nn.log_softmax(scores, -1)
        conf_loss = -jnp.take_along_axis(logp, t_label[..., None], -1)[..., 0]
        # hard negative mining: top-(3*num_pos) negatives by loss
        neg_loss = jnp.where(pos > 0, -jnp.inf, jax.lax.stop_gradient(conf_loss))
        rank = jnp.argsort(jnp.argsort(-neg_loss, axis=1), axis=1)
        num_neg = jnp.minimum(num_pos * self.neg_pos_ratio, a)
        num_neg = jnp.where(num_pos > 0, num_neg, a * 0.01)
        neg_mask = (rank < num_neg).astype(jnp.float32)
        conf_loss = (conf_loss * (pos + neg_mask)).sum() * self.conf_loss_weight

        normalizer = jnp.maximum(num_pos.sum(), 1.0)
        return (conf_loss + loc_loss) / normalizer


def _smooth_l1(pred, target):
    d = jnp.abs(pred - target)
    return jnp.where(d < 1.0, 0.5 * d * d, d - 0.5)


class SSD(nn.Module):
    def __init__(self, num_classes=80, image_size=(300, 300),
                 score_threshold=0.01, nms_threshold=0.45, nms_top_k=400,
                 keep_top_k=200):
        self.backbone = SSDMobileNetBackbone()
        self.ssd_head = SSDHead(num_classes,
                                in_channels=self.backbone.out_channels)
        self.loss = SSDLoss()
        self.image_size = tuple(image_size)
        h, w = image_size
        feat_hws = [(np.ceil(h / s).astype(int), np.ceil(w / s).astype(int))
                    for s in (16, 32, 64, 128, 256, 512)]
        # actual grid sizes come from the conv geometry; compute via trace
        self._priors = None
        self.nms_cfg = dict(score_threshold=score_threshold,
                            nms_threshold=nms_threshold, nms_top_k=nms_top_k,
                            keep_top_k=keep_top_k)

    def priors(self, feats):
        # cached as host numpy: jnp.asarray inside a jit trace would return
        # a tracer and leak via this cache
        if self._priors is None:
            hws = [tuple(f.shape[1:3]) for f in feats]
            self._priors = build_ssd_priors(hws, self.image_size)
        return self._priors

    def __call__(self, images):
        feats = self.backbone(images)
        boxes, scores = self.ssd_head(feats)
        priors = self.priors(feats)
        if is_training():
            return {"boxes": boxes, "scores": scores, "priors": priors}
        decoded = ssd_decode(boxes, priors)
        h, w = images.shape[1:3]
        decoded = decoded * jnp.asarray([w, h, w, h], decoded.dtype)
        probs = jax.nn.softmax(scores, -1)[..., :-1]  # drop background
        return multiclass_nms(decoded, probs, **self.nms_cfg)

    def loss_fn(self, outputs, targets):
        gt_bbox = targets["boxes"]       # [B, N, 4] normalized xyxy
        gt_label = targets["class_labels"].astype(jnp.int32)
        gt_mask = targets.get("mask")
        if gt_mask is None:
            gt_mask = (gt_bbox[..., 2] > gt_bbox[..., 0]).astype(jnp.float32)
        return self.loss(outputs["boxes"], outputs["scores"], gt_bbox,
                         gt_label, gt_mask, outputs["priors"])
