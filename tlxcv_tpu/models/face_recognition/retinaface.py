"""RetinaFace (reference tlxcv/models/face_recognition/retinaface.py:
FPN :44, SSH :84, heads :126-191, RetinaFace :192, MultiBoxLoss :288),
NHWC with static-shape masked losses (no boolean mask_select)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ... import nn
from ...core import init as I
from ..classification.resnet import ResNet

__all__ = ["RetinaFace", "multi_box_loss"]


class ConvUnit(nn.Module):
    def __init__(self, cin, cout, k, s, act=None):
        self.conv = nn.Conv2d(cin, cout, k, stride=s, padding=(k - 1) // 2,
                              bias=False,
                              w_init=lambda sh: I.kaiming_normal(sh))
        self.bn = nn.BatchNorm(cout)
        self.act = act

    def __call__(self, x):
        x = self.bn(self.conv(x))
        if self.act == "relu":
            return nn.relu(x)
        if self.act == "lrelu":
            return nn.leaky_relu(x, 0.1)
        return x


class FPN(nn.Module):
    def __init__(self, in_channels, out_ch):
        act = "lrelu" if out_ch <= 64 else "relu"
        self.outputs = [ConvUnit(c, out_ch, 1, 1, act) for c in in_channels]
        self.merge1 = ConvUnit(out_ch, out_ch, 3, 1, act)
        self.merge2 = ConvUnit(out_ch, out_ch, 3, 1, act)

    def __call__(self, feats):
        from ...ops.image import upsample_add

        out1, out2, out3 = [conv(f) for conv, f in zip(self.outputs, feats)]
        out2 = self.merge2(upsample_add(out3, out2, mode="nearest"))
        out1 = self.merge1(upsample_add(out2, out1, mode="nearest"))
        return out1, out2, out3


class SSH(nn.Module):
    def __init__(self, ch, out_ch):
        assert out_ch % 4 == 0
        act = "lrelu" if out_ch <= 64 else "relu"
        self.conv_3x3 = ConvUnit(ch, out_ch // 2, 3, 1, None)
        self.conv_5x5_1 = ConvUnit(ch, out_ch // 4, 3, 1, act)
        self.conv_5x5_2 = ConvUnit(out_ch // 4, out_ch // 4, 3, 1, None)
        self.conv_7x7_2 = ConvUnit(out_ch // 4, out_ch // 4, 3, 1, act)
        self.conv_7x7_3 = ConvUnit(out_ch // 4, out_ch // 4, 3, 1, None)

    def __call__(self, x):
        c3 = self.conv_3x3(x)
        c51 = self.conv_5x5_1(x)
        c5 = self.conv_5x5_2(c51)
        c7 = self.conv_7x7_3(self.conv_7x7_2(c51))
        return nn.relu(jnp.concatenate([c3, c5, c7], -1))


class _Head(nn.Module):
    def __init__(self, ch, num_anchor, out_per_anchor):
        self.conv = nn.Conv2d(ch, num_anchor * out_per_anchor, 1)
        self.out = out_per_anchor

    def __call__(self, x):
        y = self.conv(x)
        return y.reshape(y.shape[0], -1, self.out)


def _smooth_l1(y_true, y_pred):
    t = jnp.abs(y_pred - y_true)
    return jnp.where(t < 1, 0.5 * t * t, t - 0.5)


def multi_box_loss(y_true, y_pred, neg_pos_ratio=3):
    """(reference MultiBoxLoss :288-345) with masked means instead of
    boolean gathers.  y_true [B, A, 16] = (loc4, landm10, landm_valid,
    class); y_pred = (loc, landm, class_probs)."""
    loc_pred, landm_pred, class_pred = y_pred
    loc_true = y_true[..., 0:4]
    landm_true = y_true[..., 4:14]
    landm_valid = y_true[..., 14]
    class_true = y_true[..., 15]
    num_prior = loc_pred.shape[1]

    mask_pos = class_true == 1
    mask_neg = class_true == 0
    mask_landm = (landm_valid == 1) & mask_pos

    def masked_mean(x, m):
        m = m.astype(x.dtype)
        while m.ndim < x.ndim:
            m = m[..., None]
        return jnp.sum(x * m) / jnp.maximum(
            jnp.sum(jnp.broadcast_to(m, x.shape)), 1.0)

    loss_landm = masked_mean(_smooth_l1(landm_true, landm_pred), mask_landm)
    loss_loc = masked_mean(_smooth_l1(loc_true, loc_pred), mask_pos)

    # hard negative mining on (1 - p_background)
    loss_class = jnp.where(mask_neg, 1 - class_pred[..., 0], 0.0)
    idx = jnp.argsort(-loss_class, axis=1)
    rank = jnp.argsort(idx, axis=1)
    num_pos = jnp.maximum(mask_pos.sum(axis=1, keepdims=True), 1)
    num_neg = jnp.minimum(neg_pos_ratio * num_pos, num_prior - 1)
    mask_hard_neg = rank < num_neg

    sel = mask_pos | mask_hard_neg
    cls_true = mask_pos.astype(jnp.int32)
    # Probability-space CE: clip away from {0, 1} (1e-6 guideline) — raw
    # log(p + tiny) NaNs under XLA reassociation (see CLAUDE.md).
    logp = jnp.log(jnp.clip(class_pred, 1e-6, 1.0))
    ce = -jnp.take_along_axis(logp, cls_true[..., None], -1)[..., 0]
    loss_class = jnp.sum(ce * sel) / jnp.maximum(jnp.sum(sel), 1.0)
    return loss_loc, loss_landm, loss_class


class RetinaFace(nn.Module):
    def __init__(self, input_size=640, out_channel=256,
                 min_sizes=((16, 32), (64, 128), (256, 512)), iou_th=0.4,
                 score_th=0.02):
        self.input_size = input_size
        self.num_anchor = len(min_sizes[0])
        self.min_sizes = min_sizes
        self.iou_th = iou_th
        self.score_th = score_th
        self.backbone = ResNet(depth=50, num_classes=0, with_pool=False)
        in_chs = self.backbone.feat_channels[1:]  # C3, C4, C5
        self.fpn = FPN(in_chs, out_channel)
        self.ssh = [SSH(out_channel, out_channel) for _ in range(3)]
        self.bboxheads = [_Head(out_channel, self.num_anchor, 4)
                          for _ in range(3)]
        self.landheads = [_Head(out_channel, self.num_anchor, 10)
                          for _ in range(3)]
        self.classheads = [_Head(out_channel, self.num_anchor, 2)
                           for _ in range(3)]

    def __call__(self, x):
        feats = self.backbone.features(x)[1:]  # C3, C4, C5
        feats = self.fpn(feats)
        feats = [ssh(f) for ssh, f in zip(self.ssh, feats)]
        bbox = jnp.concatenate([h(f) for h, f in zip(self.bboxheads, feats)], 1)
        landm = jnp.concatenate([h(f) for h, f in zip(self.landheads, feats)], 1)
        cls = jnp.concatenate([h(f) for h, f in zip(self.classheads, feats)], 1)
        return bbox, landm, jax.nn.softmax(cls, -1)

    def loss_fn(self, predictions, labels):
        w = h = self.input_size
        loc, landm, cls = predictions
        loc = loc * jnp.asarray([w, h] * 2, loc.dtype)
        landm = landm * jnp.asarray([w, h] * 5, landm.dtype)
        l_loc, l_landm, l_cls = multi_box_loss(labels, (loc, landm, cls))
        return l_loc + l_landm + l_cls
