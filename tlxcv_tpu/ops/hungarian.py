"""Hungarian (linear sum assignment) for DETR matching.

The reference calls scipy from inside its loss
(reference tlxcv/models/detection/detr.py:3,:1220 — a host/device
boundary per batch).  Here both options exist:

- :func:`hungarian_callback` — jit-safe `pure_callback` to scipy (exact,
  host round-trip; fine for training where the cost matrix is tiny).
- :func:`auction_assign` — on-device auction algorithm (approximate
  epsilon-scaling; stays on TPU, no host sync).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["hungarian_callback", "auction_assign"]


def _scipy_lsa(cost):
    from scipy.optimize import linear_sum_assignment

    cost = np.asarray(cost)
    if cost.ndim == 2:
        r, c = linear_sum_assignment(cost)
        out = np.full((cost.shape[0],), -1, np.int32)
        out[r] = c.astype(np.int32)
        return out
    return np.stack([_scipy_lsa(c) for c in cost])


def hungarian_callback(cost):
    """Exact assignment via host callback.

    cost: [..., R, C] with R <= C. Returns col index per row [..., R].
    """
    shape = jax.ShapeDtypeStruct(cost.shape[:-1], jnp.int32)
    return jax.pure_callback(_scipy_lsa, shape, cost, vmap_method="broadcast_all")


@functools.partial(jax.jit, static_argnames=("num_iters",))
def auction_assign(cost, num_iters: int = 200, eps: float = 1e-3):
    """On-device auction algorithm minimizing total cost.

    cost: [R, C], R <= C.  Returns col assignment per row [R] (int32).
    Approximate (epsilon-optimal); use for inference-time matching or
    large batches where the host round-trip dominates.
    """
    r, c = cost.shape
    benefit = -cost  # auction maximizes
    prices = jnp.zeros((c,), cost.dtype)
    owner = jnp.full((c,), -1, jnp.int32)
    assign = jnp.full((r,), -1, jnp.int32)

    def body(_, carry):
        prices, owner, assign = carry
        unassigned = assign < 0
        # each unassigned row bids for its best column
        value = benefit - prices[None, :]
        best = jnp.argmax(value, axis=1)
        best_v = jnp.max(value, axis=1)
        masked = value.at[jnp.arange(r), best].set(-jnp.inf)
        second_v = jnp.max(masked, axis=1)
        bid = best_v - second_v + eps
        # highest bidder per column wins (conflicts resolved by max bid)
        bid_mat = jnp.full((r, c), -jnp.inf, cost.dtype)
        bid_mat = bid_mat.at[jnp.arange(r), best].set(
            jnp.where(unassigned, bid, -jnp.inf))
        win_bid = jnp.max(bid_mat, axis=0)
        win_row = jnp.argmax(bid_mat, axis=0).astype(jnp.int32)
        col_has_bid = win_bid > -jnp.inf
        # previous owner of a re-auctioned column loses it (scatter with an
        # out-of-range sentinel index so no-ops drop cleanly)
        evict_idx = jnp.where(col_has_bid & (owner >= 0), owner, r)
        assign = assign.at[evict_idx].set(-1, mode="drop")
        owner = jnp.where(col_has_bid, win_row, owner)
        prices = jnp.where(col_has_bid, prices + win_bid, prices)
        assign_idx = jnp.where(col_has_bid, win_row, r)
        assign = assign.at[assign_idx].set(
            jnp.arange(c, dtype=jnp.int32), mode="drop")
        return prices, owner, assign

    prices, owner, assign = jax.lax.fori_loop(0, num_iters, body,
                                              (prices, owner, assign))
    return assign
