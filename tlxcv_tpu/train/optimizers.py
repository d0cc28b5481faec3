"""Optimizer factories (reference `tlx.optimizers.*` surface → optax)."""
from __future__ import annotations

import optax

__all__ = ["Adam", "AdamW", "SGD", "Momentum", "RMSprop", "EpochDecay",
           "cosine_schedule", "warmup_cosine", "no_decay_mask"]


def no_decay_mask(params: dict) -> dict:
    """Standard decay mask: weight decay applies only to rank>=2 kernels
    — biases and BN/LN scales/offsets (rank-1/0) are exempt (the
    torch/paddle recipe convention).  Pass as ``weight_decay_mask`` to
    :func:`Adam`/:func:`AdamW` or as optax's ``mask=``."""
    return {k: bool(getattr(v, "ndim", 0) >= 2) for k, v in params.items()}


def Adam(lr=1e-3, beta_1=0.9, beta_2=0.999, eps=1e-8, weight_decay=0.0,
         grad_clip=None, weight_decay_mask=None):
    tx = (optax.adamw(lr, b1=beta_1, b2=beta_2, eps=eps,
                      weight_decay=weight_decay, mask=weight_decay_mask)
          if weight_decay else optax.adam(lr, b1=beta_1, b2=beta_2, eps=eps))
    return _with_clip(tx, grad_clip)


def AdamW(lr=1e-3, weight_decay=1e-4, **kw):
    return Adam(lr, weight_decay=weight_decay, **kw)


def SGD(lr=0.01, momentum=0.0, weight_decay=0.0, nesterov=False,
        grad_clip=None):
    tx = optax.sgd(lr, momentum=momentum or None, nesterov=nesterov)
    if weight_decay:
        tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
    return _with_clip(tx, grad_clip)


def Momentum(lr=0.01, momentum=0.9, **kw):
    return SGD(lr, momentum=momentum, **kw)


def RMSprop(lr=1e-3, decay=0.9, eps=1e-8, grad_clip=None):
    return _with_clip(optax.rmsprop(lr, decay=decay, eps=eps), grad_clip)


def _with_clip(tx, grad_clip):
    if grad_clip:
        return optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    return tx


def EpochDecay(base_lr, steps_per_epoch, boundaries_epochs=(17, 20), rate=0.1):
    """Step decay by epoch (reference tasks/human_pose_estimation.py:377-388
    EpochDecay scheduler), expressed as an optax schedule over steps."""
    bounds = {int(e * steps_per_epoch): rate for e in boundaries_epochs}
    return optax.piecewise_constant_schedule(base_lr, bounds)


def cosine_schedule(base_lr, total_steps, final_scale=0.0):
    return optax.cosine_decay_schedule(base_lr, total_steps, alpha=final_scale)


def warmup_cosine(base_lr, warmup_steps, total_steps, final_scale=0.0):
    return optax.warmup_cosine_decay_schedule(
        0.0, base_lr, warmup_steps, total_steps, end_value=base_lr * final_scale)
