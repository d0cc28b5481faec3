"""Loss functions shared across tasks.

Replaces `tlx.losses.*` and escape #5 (softmax_with_cross_entropy,
reference tlxcv/models/detection/utils/ops.py:466) plus the detection
losses (sigmoid focal: reference detr.py:1590, varifocal:
reference ppyoloe.py:917-926, dice: reference detr.py:1621).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

__all__ = [
    "softmax_cross_entropy", "cross_entropy", "binary_cross_entropy",
    "sigmoid_focal_loss", "varifocal_loss", "dice_loss", "smooth_l1_loss",
    "l1_loss", "mse_loss", "giou_loss", "wing_loss",
]


def softmax_cross_entropy(logits, labels, label_smoothing=0.0, axis=-1,
                          reduction="mean"):
    """CE over logits; integer or one-hot labels.  ``axis`` selects the
    class axis of BOTH logits and (one-hot) labels."""
    if axis not in (-1, logits.ndim - 1):
        logits = jnp.moveaxis(logits, axis, -1)
        if labels.ndim == logits.ndim:      # one-hot with the same layout
            labels = jnp.moveaxis(labels, axis, -1)
    nc = logits.shape[-1]
    if labels.ndim == logits.ndim - 1 or labels.dtype in (jnp.int32, jnp.int64):
        labels = jax.nn.one_hot(labels, nc, dtype=logits.dtype)
    if label_smoothing:
        labels = labels * (1.0 - label_smoothing) + label_smoothing / nc
    loss = optax.softmax_cross_entropy(logits, labels)
    return _reduce(loss, reduction)


cross_entropy = softmax_cross_entropy


def binary_cross_entropy(logits, targets, reduction="mean", pos_weight=None):
    """BCE with logits."""
    log_p = jax.nn.log_sigmoid(logits)
    log_np = jax.nn.log_sigmoid(-logits)
    w = 1.0 if pos_weight is None else pos_weight
    loss = -(w * targets * log_p + (1.0 - targets) * log_np)
    return _reduce(loss, reduction)


def sigmoid_focal_loss(logits, targets, alpha=0.25, gamma=2.0, reduction="none"):
    """Focal loss (reference detr.py:1590)."""
    p = jax.nn.sigmoid(logits)
    ce = binary_cross_entropy(logits, targets, reduction="none")
    p_t = p * targets + (1 - p) * (1 - targets)
    loss = ce * ((1 - p_t) ** gamma)
    if alpha >= 0:
        alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
        loss = alpha_t * loss
    return _reduce(loss, reduction)


def varifocal_loss(pred_logits, gt_score, label, alpha=0.75, gamma=2.0):
    """Varifocal loss (reference ppyoloe.py:917-926). Returns sum."""
    pred = jax.nn.sigmoid(pred_logits)
    weight = alpha * (pred ** gamma) * (1 - label) + gt_score * label
    ce = binary_cross_entropy(pred_logits, gt_score, reduction="none")
    return jnp.sum(ce * weight)


def dice_loss(logits, targets, smooth=1.0, reduction="mean"):
    """Dice loss over sigmoid probabilities (reference detr.py:1621)."""
    p = jax.nn.sigmoid(logits)
    p = p.reshape(p.shape[0], -1)
    t = targets.reshape(targets.shape[0], -1)
    num = 2.0 * jnp.sum(p * t, axis=-1)
    den = jnp.sum(p, axis=-1) + jnp.sum(t, axis=-1)
    loss = 1.0 - (num + smooth) / (den + smooth)
    return _reduce(loss, reduction)


def smooth_l1_loss(pred, target, beta=1.0, reduction="mean"):
    diff = jnp.abs(pred - target)
    loss = jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)
    return _reduce(loss, reduction)


def l1_loss(pred, target, reduction="mean"):
    return _reduce(jnp.abs(pred - target), reduction)


def mse_loss(pred, target, reduction="mean"):
    return _reduce((pred - target) ** 2, reduction)


def wing_loss(pred, target, w=10.0, epsilon=2.0, reduction="mean"):
    """Wing loss (Feng et al., CVPR'18) — the facial-landmark standard:
    logarithmic inside |x| < w so small localization errors keep a large
    gradient (plain L2 stalls there — r2's PFLD NME plateau), linear
    outside.  C makes the pieces continuous."""
    diff = jnp.abs(pred - target)
    c = w - w * jnp.log(1.0 + w / epsilon)
    loss = jnp.where(diff < w, w * jnp.log(1.0 + diff / epsilon), diff - c)
    return _reduce(loss, reduction)


def giou_loss(pred_boxes, target_boxes, reduction="mean"):
    from .boxes import aligned_iou

    loss = 1.0 - aligned_iou(pred_boxes, target_boxes, mode="giou")
    return _reduce(loss, reduction)


def _reduce(loss, reduction):
    if reduction == "mean":
        return jnp.mean(loss)
    if reduction == "sum":
        return jnp.sum(loss)
    if reduction not in (None, "none"):
        raise ValueError(f"unknown reduction {reduction!r}")
    return loss
