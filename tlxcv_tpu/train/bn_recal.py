"""Exact BatchNorm running-stat re-estimation (the SWA ``update_bn``
idiom, torch.optim.swa_utils.update_bn).

Why this exists: BN running stats are an EMA that lags the activation
scale while weights are still moving.  Losses with non-vanishing
gradients (wing, focal) keep weights drifting at ANY useful lr, so the
per-layer lag never closes, and through a deep stack (PFLD: ~60 serial
BNs) the per-layer mismatch compounds exponentially — train-mode
(batch-stat) predictions stay good while eval-mode predictions explode
(measured: eval/train activation-rms ratio 1.33 at the first BN growing
to ~5x by the head; demo/facial_landmark_detection/accuracy_check.py
history).  With weights FROZEN the batch statistics are stationary, so
replacing the EMA with the exact average of per-batch statistics over N
batches removes the lag entirely.

Implementation: every ``nn.BatchNorm``'s momentum is temporarily set to
0.0 (one retrace), making the returned state's running stats the EXACT
current-batch stats; those are averaged arithmetically over the
provided batches and written back into a copy of ``state``.  Only
``BatchStat`` entries touched by the forward are replaced; ``Cache``
entries and unexercised stats pass through unchanged.
"""
from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp

from ..core.module import BatchStat, Module, iter_variables, pure

__all__ = ["recalibrate_batch_stats"]


def recalibrate_batch_stats(model: Module, params: dict, state: dict,
                            batches: tp.Iterable,
                            forward: tp.Union[str, tp.Callable] = "__call__",
                            rngs=None):
    """Return a new ``state`` whose BN running stats are the exact
    average of per-batch statistics of ``model(params)`` over
    ``batches`` (weights frozen).

    ``batches`` yields forward-arg tuples (or a single array per batch).
    ``forward`` selects the method to drive (as in ``pure``); stats of
    layers the chosen forward does not execute are left untouched.
    ``rngs`` (a seed int, jax key, or core.module.Rngs) is required for
    models whose training-mode forward draws randomness (Dropout/
    DropPath raise without it).
    """
    from ..core.module import Rngs

    if rngs is not None and not isinstance(rngs, Rngs):
        rngs = Rngs(jax.random.key(rngs) if isinstance(rngs, int) else rngs)
    from ..nn.layers import BatchNorm

    bns = [m for _, m in model.modules() if isinstance(m, BatchNorm)]
    saved = [bn.momentum for bn in bns]
    for bn in bns:
        bn.momentum = 0.0
    try:
        fwd = pure(model, forward)

        @jax.jit
        def batch_stats(p, s, args):
            return fwd(p, s, *args, training=True, rngs=rngs)[1]

        stat_keys = {path for path, v in iter_variables(model, BatchStat)}
        acc: tp.Optional[dict] = None
        n = 0
        for args in batches:
            if not isinstance(args, tuple):
                args = (args,)
            st2 = batch_stats(params, state, args)
            picked = {k: st2[k].astype(jnp.float32) for k in st2
                      if k in stat_keys}
            acc = picked if acc is None else \
                {k: acc[k] + picked[k] for k in acc}
            n += 1
        if not n:
            return dict(state)
        out = dict(state)
        for k in acc:
            out[k] = acc[k] / n
        return out
    finally:
        for bn, m in zip(bns, saved):
            bn.momentum = m
