"""GPipe-style pipeline parallelism over a mesh axis.

The reference has no distributed story at all (SURVEY.md §2.10); this is
TPU-native new capability: the repeated trunk of a network (transformer
blocks, conv stages) is sharded layer-stacked over a mesh axis, and
microbatches stream through a `shard_map` ring — activations hop stages
via `lax.ppermute` over ICI, so a model larger than one chip's HBM runs
with classic 1F pipeline overlap.

Usage:
    stacked = stack_stage_params([split(block)[0] for block in blocks])
    y = pipeline_apply(stage_fn, stacked, x, mesh, axis="model",
                       microbatches=8)

``stage_fn(params_slice, activations) -> activations`` must preserve the
activation shape (classic homogeneous-trunk pipelining).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
try:  # jax >= 0.8 moved shard_map out of experimental
    from jax import shard_map
except ImportError:  # pragma: no cover
    # the experimental signature takes check_rep, not check_vma
    from jax.experimental.shard_map import shard_map as _sm

    def shard_map(f=None, *, check_vma=None, **kw):  # noqa: D401
        if check_vma is not None:
            kw["check_rep"] = check_vma
        return _sm(f, **kw) if f is not None else (
            lambda g: _sm(g, **kw))
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["pipeline_apply", "stack_stage_params"]


def stack_stage_params(per_stage_params):
    """[{path: arr}, ...] per stage -> one pytree with a leading stage
    axis (the layout pipeline_apply shards over the pipeline axis)."""
    keys = per_stage_params[0].keys()
    return {k: jnp.stack([p[k] for p in per_stage_params]) for k in keys}


def pipeline_apply(stage_fn, stacked_params, x, mesh: Mesh,
                   axis: str = "model", microbatches: int = 4):
    """Run ``stage_fn`` as an S-stage pipeline over ``mesh[axis]``.

    x [B, ...] is split into ``microbatches`` along the batch dim; the
    schedule runs M + S - 1 ticks: at tick t, stage s computes microbatch
    (t - s), and activations ppermute one hop forward.  Output equals the
    serial composition of all stages (tested bit-close on the virtual
    CPU mesh).
    """
    s_stages = mesh.shape[axis]
    n_stacked = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    # each device takes params[0] of its slice: a stacked stage count
    # larger than the axis would SILENTLY skip layers
    assert n_stacked == s_stages, (
        f"{n_stacked} stacked stages != mesh axis {axis!r} size {s_stages}")
    b = x.shape[0]
    assert b % microbatches == 0, (b, microbatches)
    mbs = x.reshape((microbatches, b // microbatches) + x.shape[1:])
    perm = [(i, (i + 1) % s_stages) for i in range(s_stages)]

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis), P()), out_specs=P(),
        check_vma=False)
    def run(params, mbs):
        # this stage's parameter slice (leading axis length 1 here)
        params = jax.tree_util.tree_map(lambda a: a[0], params)
        idx = jax.lax.axis_index(axis)
        n_ticks = microbatches + s_stages - 1

        def tick(carry, t):
            state, outs = carry
            # stage 0 ingests microbatch t (clamped; masked when t >= M)
            x_in = jax.lax.dynamic_index_in_dim(
                mbs, jnp.clip(t, 0, microbatches - 1), 0, keepdims=False)
            inp = jnp.where(idx == 0, x_in, state)
            y = stage_fn(params, inp)
            # last stage emits microbatch t - (S - 1)
            out_t = t - (s_stages - 1)
            outs = jax.lax.cond(
                out_t >= 0,
                lambda o: jax.lax.dynamic_update_index_in_dim(
                    o, y, jnp.clip(out_t, 0, microbatches - 1), 0),
                lambda o: o, outs)
            state = jax.lax.ppermute(y, axis, perm)
            return (state, outs), None

        state0 = jnp.zeros_like(mbs[0])
        outs0 = jnp.zeros_like(mbs)
        (_, outs), _ = jax.lax.scan(tick, (state0, outs0),
                                    jnp.arange(n_ticks))
        # only the last stage's buffer holds results; replicate via psum
        outs = jnp.where(idx == s_stages - 1, outs, 0.0)
        return jax.lax.psum(outs, axis)

    out = run(stacked_params, mbs)
    return out.reshape((b,) + x.shape[1:])
