"""Distillation-aware classification (DeiT/LeViT recipe).

The reference ships distillation-head architectures (LeViT
head_dist, reference tlxcv/models/classification/levit.py:389-396;
DeiT dist_token, distilled_vision_transformer.py) but no training
recipe for them; this task completes the story the TPU way:

- the TEACHER stays OUTSIDE the train graph — :func:`teacher_labels`
  jit-compiles the teacher's forward once and maps it over the loader,
  so the optimizer never sees teacher params (no freezing machinery,
  no wasted teacher backward, and the teacher batch can run on-device
  back-to-back with the train step),
- the STUDENT's training forward returns ``(class_logits,
  dist_logits)`` (both LeViT with ``distillation=True`` and DeiT do);
  the loss is the DeiT objective: hard distillation
  ``CE(y, label)/2 + CE(y_dist, argmax teacher)/2`` or soft
  ``(1-alpha)*CE + alpha*tau^2*KL(student/tau || teacher/tau)``.

At eval the models average both heads themselves, so ``predict`` is a
plain argmax.
"""
from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp

from .. import nn
from ..ops.losses import softmax_cross_entropy

__all__ = ["DistilledClassification", "teacher_labels"]


class DistilledClassification(nn.Module):
    """Task head for a distillation-head student (LeViT
    ``distillation=True``, DeiT).

    Targets are dicts ``{"label": int labels, "teacher": teacher
    logits}`` — produce them with :func:`teacher_labels`.  ``hard=True``
    is the DeiT default (the distillation head learns the teacher's
    argmax); ``hard=False`` uses the soft KL objective with temperature
    ``tau``.
    """

    def __init__(self, backbone: nn.Module, hard: bool = True,
                 alpha: float = 0.5, tau: float = 1.0):
        self.backbone = backbone
        self.hard = hard
        self.alpha = alpha
        self.tau = tau

    def __call__(self, inputs):
        return self.backbone(inputs)

    def loss_fn(self, output, target):
        if isinstance(target, dict) and "teacher" in target:
            label, teacher = target["label"], target["teacher"]
        else:  # plain labels: fall back to CE over the (averaged) head
            out = output[0] if isinstance(output, tuple) else output
            return softmax_cross_entropy(out, target)
        if isinstance(output, tuple):
            y, y_dist = output
        else:  # eval-mode averaged head: supervise it with both terms
            y = y_dist = output
        ce = softmax_cross_entropy(y, label)
        if self.hard:
            dist = softmax_cross_entropy(
                y_dist, jnp.argmax(teacher, axis=-1))
            return 0.5 * ce + 0.5 * dist
        t = self.tau
        log_p = jax.nn.log_softmax(y_dist / t, axis=-1)
        q = jax.nn.softmax(teacher / t, axis=-1)
        kl = jnp.sum(q * (jnp.log(jnp.clip(q, 1e-6, 1.0)) - log_p), axis=-1)
        return (1 - self.alpha) * ce + self.alpha * (t * t) * jnp.mean(kl)

    def predict(self, inputs):
        out = self.backbone(inputs)
        if isinstance(out, tuple):  # training-mode dual heads
            out = (out[0] + out[1]) / 2
        return jnp.argmax(out, axis=-1)


def teacher_labels(teacher: nn.Module, batches: tp.Iterable,
                   params=None, state=None):
    """Wrap a ``(x, label)`` batch iterable into ``(x, {"label",
    "teacher"})`` batches by running the (frozen) teacher's jitted
    forward — the teacher never enters the student's train graph."""
    from ..core.module import pure, split

    if params is None or state is None:
        params, state = split(teacher)
    fwd = jax.jit(pure(teacher))

    def gen():
        for x, label in batches:
            logits, _ = fwd(params, state, jnp.asarray(x))
            if isinstance(logits, tuple):
                logits = (logits[0] + logits[1]) / 2
            yield x, {"label": label, "teacher": logits}

    return gen()
