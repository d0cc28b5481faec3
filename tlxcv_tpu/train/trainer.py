"""Jit-compiled Trainer.

Replaces the reference's eager per-op train loops (`tlx.model.Model` and
the custom Trainer at reference tasks/human_pose_estimation.py:399-566):
one compiled ``train_step(params, state, opt_state, batch)`` per model,
batch sharded over the mesh's 'data' axis, gradients averaged by XLA
collectives (SURVEY.md §3.1 "TPU equivalent").

User surface stays source-compatible with the reference demos:

    trainer = Trainer(network=model, loss_fn=model.loss_fn,
                      optimizer=optax.adam(1e-4), metrics=Accuracy())
    trainer.train(n_epoch=..., train_dataset=loader, test_dataset=loader)
"""
from __future__ import annotations

import time
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core.module import Module, Rngs, load_state_dict, pure, split
from ..parallel.mesh import data_parallel_shardings, get_mesh, make_mesh
from ..utils.metrics import Metric


def _host(tree):
    """Device pytree -> host numpy, preserving tuple/dict structure
    (tuple model outputs like PFLD's (landmarks, features) would crash a
    bare np.asarray)."""
    return jax.tree_util.tree_map(np.asarray, tree)


class Trainer:
    """Generic trainer; alias `Model` keeps reference-demo spelling."""

    def __init__(self, network: Module, loss_fn=None, optimizer=None,
                 metrics: tp.Optional[Metric] = None, mesh=None, seed: int = 0,
                 param_sharding: str = "replicated",
                 ema_decay: tp.Optional[float] = None,
                 ema_for_eval: bool = True,
                 compute_dtype: tp.Optional[tp.Any] = None,
                 remat: bool = False,
                 grad_accum: int = 1,
                 nan_guard: bool = False):
        """``param_sharding="fsdp"`` shards every large parameter over the
        mesh 'data' axis (ZeRO-3; parallel.mesh.fsdp_shardings) — XLA
        inserts the all-gathers/reduce-scatters; the optimizer state
        inherits the sharding via zeros_like at init.

        ``ema_decay`` keeps an exponential moving average of the params
        updated inside the SAME jitted train step (the PaddleDet-recipe
        convention the reference models descend from, e.g. PPYOLOE's
        ema/ema_decay 0.9998); ``ema_for_eval`` routes evaluate/predict/
        save_weights through the averaged weights.

        ``compute_dtype=jnp.bfloat16`` enables mixed-precision training:
        master weights, gradients, optimizer state, BN running stats and
        the loss stay f32; the forward/backward compute runs in bf16
        (params and float inputs are cast INSIDE the differentiated
        function so grads flow back to the f32 masters; model outputs
        are cast to f32 before loss_fn; new batch-stats are cast back to
        their stored dtypes).

        ``remat=True`` wraps the forward in ``jax.checkpoint`` so the
        backward pass recomputes activations instead of keeping them in
        HBM — the standard TPU trade of FLOPs for memory when activation
        working sets approach the 16 GB/chip ceiling (identical
        gradients, tested).

        ``grad_accum=k`` accumulates gradients over k microbatches
        before applying one (averaged) optimizer update — an effective
        batch k× what fits in HBM (optax.MultiSteps; schedules advance
        once per accumulated step, matching large-batch semantics; the
        EMA likewise advances once per APPLIED update, not per
        microbatch, keeping the averaging horizon batch-size-invariant).

        ``nan_guard=True`` checks loss + gradients for non-finite values
        INSIDE the jitted step and skips the whole update (params, opt
        state, EMA and BN stats all keep their previous values) when the
        check fails, so one pathological batch can't destroy a long run.
        Skipped steps are excluded from the epoch-mean loss and counted
        in ``trainer.nan_skips`` (reported in the epoch log)."""
        self.network = network
        self.loss_fn = loss_fn if loss_fn is not None else network.loss_fn
        self.optimizer = optimizer if optimizer is not None else optax.adam(1e-3)
        self.grad_accum = int(grad_accum)
        if self.grad_accum > 1:
            self.optimizer = optax.MultiSteps(self.optimizer,
                                              every_k_schedule=self.grad_accum)
        self.nan_guard = bool(nan_guard)
        self.nan_skips = 0
        self.metrics = metrics
        try:
            self.mesh = get_mesh(mesh)
        except Exception:
            self.mesh = make_mesh(1, 1)

        self.params, self.state = split(network)
        if param_sharding == "fsdp":
            from ..parallel.mesh import fsdp_shardings, place_params

            self.param_shardings = fsdp_shardings(self.params, self.mesh)
            self.params = place_params(self.params, self.param_shardings)
        elif param_sharding != "replicated":
            raise ValueError(f"unknown param_sharding {param_sharding!r}")
        self.opt_state = self.optimizer.init(self.params)
        self.step = 0
        self._key = jax.random.key(seed)
        self.ema_decay = None if ema_decay is None else float(ema_decay)
        self.ema_for_eval = ema_for_eval and ema_decay is not None
        # seeded at the trained params so no debiasing is needed
        self.ema_params = dict(self.params) if ema_decay is not None else None
        self.compute_dtype = compute_dtype

        loss_fn = self.loss_fn

        # Epoch-dependent training recipes (PPYOLOE's ATSS→TaskAligned
        # assigner switch at `epoch_id < static_assigner_epoch`): thread
        # the epoch through as a STATIC arg, bucketed to {0, switch} so
        # exactly two jit variants exist (ADVICE r1: Trainer previously
        # never passed it, silently pinning the static assigner).
        self._assigner_switch_epoch = None
        for obj in (network, getattr(network, "backbone", None)):
            head = getattr(obj, "yolo_head", None) if obj is not None else None
            for cand in (obj, head):
                if cand is not None and hasattr(cand, "static_assigner_epoch"):
                    self._assigner_switch_epoch = cand.static_assigner_epoch
        takes_epoch = self._assigner_switch_epoch is not None

        compute_dtype = self.compute_dtype

        def _cast_floats(tree, dt):
            return jax.tree_util.tree_map(
                lambda v: v.astype(dt)
                if hasattr(v, "dtype") and jnp.issubdtype(v.dtype, jnp.floating)
                else v, tree)

        def _train_call(module, x, y, epoch_id=0):
            if compute_dtype is not None:
                x = _cast_floats(x, compute_dtype)
            out = module(x, epoch_id=epoch_id) if takes_epoch else module(x)
            if compute_dtype is not None:
                out = _cast_floats(out, jnp.float32)  # loss math stays f32
            loss = loss_fn(out, y)
            if isinstance(loss, tuple):
                loss, out = loss[0], loss[1]
            return loss, out

        def _eval_call(module, x, y, epoch_id=0):
            # no compute_dtype cast: evaluate() scores the same f32
            # function predict() serves (the bf16 policy is a TRAINING
            # compute policy, not an eval quantization)
            out = module(x, epoch_id=epoch_id) if takes_epoch else module(x)
            loss = loss_fn(out, y)
            if isinstance(loss, tuple):
                loss, out = loss[0], loss[1]
            return loss, out

        self._loss_pure = pure(network, _train_call)
        self._eval_loss_pure = pure(network, _eval_call)
        self._fwd_pure = pure(network)

        repl, shard = data_parallel_shardings(self.mesh)
        optimizer = self.optimizer
        loss_pure = self._loss_pure
        eval_loss_pure = self._eval_loss_pure
        fwd_pure = self._fwd_pure

        from functools import partial

        ema_decay = self.ema_decay
        do_remat = bool(remat)
        self.remat = do_remat
        do_nan_guard = self.nan_guard
        do_accum = self.grad_accum > 1

        # donate the optimizer state (2x params for Adam — the largest
        # transiently-doubled buffer).  params/ema are NOT donated: at
        # step 1 they alias the live module's own arrays (split() boxes),
        # and donating those invalidates the module for any later eager
        # use or second Trainer (measured: fatal aborts in the suite).
        @partial(jax.jit, static_argnames=("epoch_id",),
                 donate_argnums=(2,))
        def train_step(params, state, opt_state, ema, x, y, key, epoch_id=0):
            def fwd_loss(p):
                if compute_dtype is not None:
                    # cast inside the differentiated fn: grads come back
                    # through the cast to the f32 master weights
                    p = _cast_floats(p, compute_dtype)
                (loss, out), new_state = loss_pure(
                    p, state, x, y, epoch_id, training=True, rngs=Rngs(key))
                return loss, (out, new_state)

            lf = jax.checkpoint(fwd_loss) if do_remat else fwd_loss

            (loss, (out, new_state)), grads = jax.value_and_grad(
                lf, has_aux=True)(params)
            if compute_dtype is not None:
                # batch stats computed from low-precision activations go
                # back to their stored dtypes (f32 running stats)
                new_state = jax.tree_util.tree_map(
                    lambda ns, s: ns.astype(s.dtype), new_state, state)
            new_updates, new_opt_state = optimizer.update(grads, opt_state,
                                                          params)
            new_params = optax.apply_updates(params, new_updates)
            sel = None
            if do_nan_guard:
                # one reduction over the grads: any inf/NaN poisons the
                # sum, so isfinite(total) == all leaves finite
                total = sum(jnp.sum(g.astype(jnp.float32))
                            for g in jax.tree_util.tree_leaves(grads))
                ok = jnp.isfinite(loss) & jnp.isfinite(total)
                sel = lambda n, o: jnp.where(ok, n, o)
                new_params = jax.tree_util.tree_map(sel, new_params, params)
                new_opt_state = jax.tree_util.tree_map(sel, new_opt_state,
                                                       opt_state)
                new_state = jax.tree_util.tree_map(sel, new_state, state)
                # surface the skip: a guarded step reports loss=NaN to the
                # host loop (which counts it) while the state stays clean
                loss = jnp.where(ok, loss, jnp.float32(jnp.nan))
            params, opt_state = new_params, new_opt_state
            if ema is not None:  # trace-time branch (ema is None or a dict)
                # the EMA advances ONLY on steps where the params really
                # moved: a guarded skip must not decay the average toward
                # the (unchanged) params, and under grad_accum the k-1
                # MultiSteps accumulation no-ops must not shorten the
                # averaging horizon k-fold (MultiSteps applies the inner
                # update exactly when mini_step wraps to 0)
                gate = None
                if do_accum:
                    gate = opt_state.mini_step == 0
                if do_nan_guard:
                    gate = ok if gate is None else (gate & ok)
                new_ema = jax.tree_util.tree_map(
                    lambda e, p: e * ema_decay + p * (1.0 - ema_decay),
                    ema, params)
                if gate is not None:
                    new_ema = jax.tree_util.tree_map(
                        lambda n, o: jnp.where(gate, n, o), new_ema, ema)
                ema = new_ema
            return params, new_state, opt_state, ema, loss, out

        @jax.jit
        def eval_step(params, state, x):
            out, _ = fwd_pure(params, state, x, training=False)
            return out

        @jax.jit
        def eval_loss_step(params, state, x, y):
            (loss, out), _ = eval_loss_pure(params, state, x, y,
                                            training=False)
            return loss, out

        self._train_step = train_step
        self._eval_step = eval_step
        self._eval_loss_step = eval_loss_step
        self._shard = shard
        self._repl = repl

    # ------------------------------------------------------------------
    def _put_batch(self, batch):
        def put(x):
            x = jnp.asarray(x)
            if x.ndim >= 1 and x.shape[0] % self.mesh.shape["data"] == 0:
                return jax.device_put(x, self._shard)
            return jax.device_put(x, self._repl)
        return jax.tree_util.tree_map(put, batch)

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def _count_skips(self, losses) -> int:
        """nan_guard reports a skipped update as loss=NaN; tally them
        once per epoch (keeps the step loop free of per-step host
        syncs)."""
        if not self.nan_guard or not losses:
            return 0
        n = int(jnp.isnan(jnp.stack(losses)).sum())
        self.nan_skips += n
        return n

    def _skipped(self, loss) -> bool:
        """True when nan_guard marked this step skipped (loss=NaN) — the
        batch's garbage forward outputs must not feed the epoch metric.
        No-op (False) without the guard so no per-step host sync is
        added to unguarded runs."""
        return self.nan_guard and bool(np.isnan(np.asarray(loss)))

    def _mean_loss(self, losses) -> float:
        """Epoch-mean loss. nanmean ONLY under nan_guard (where NaN means
        'skipped, excluded by contract'); without the guard a NaN loss is
        real divergence and must stay visible in the epoch log."""
        if not losses:
            return 0.0
        stack = jnp.stack(losses)
        return float(jnp.nanmean(stack) if self.nan_guard else
                     jnp.mean(stack))

    def _epoch_bucket(self, epoch: int) -> int:
        """Static epoch_id with at most two values (before/after the
        assigner switch) so jit retraces at most once."""
        sw = self._assigner_switch_epoch
        if sw is None:
            return 0
        return 0 if epoch < sw else sw

    # ------------------------------------------------------------------
    def train(self, n_epoch: int, train_dataset, test_dataset=None,
              print_freq: int = 1, print_train_batch: bool = False,
              max_steps_per_epoch: tp.Optional[int] = None,
              progress: bool = False):
        """progress=True draws rich progress bars (the reference Trainer's
        UX, tasks/human_pose_estimation.py:418-428)."""
        if progress:
            return self._train_rich(n_epoch, train_dataset, test_dataset,
                                    print_freq, max_steps_per_epoch)
        for epoch in range(n_epoch):
            t0 = time.time()
            losses = []
            if self.metrics is not None:
                self.metrics.reset()
            from ..data.loader import device_prefetch

            batches = device_prefetch(train_dataset, self._put_batch)
            for bi, (x, y) in enumerate(batches):
                if max_steps_per_epoch is not None and bi >= max_steps_per_epoch:
                    break
                (self.params, self.state, self.opt_state, self.ema_params,
                 loss, out
                 ) = self._train_step(self.params, self.state, self.opt_state,
                                      self.ema_params, x, y, self._next_key(),
                                      epoch_id=self._epoch_bucket(epoch))
                self.step += 1
                losses.append(loss)
                if self.metrics is not None and not self._skipped(loss):
                    self.metrics.update(_host(out), _host(y))
                if print_train_batch:
                    print(f"epoch {epoch + 1} batch {bi} "
                          f"loss {float(loss):.4f}")
            skipped = self._count_skips(losses)
            if (epoch + 1) % print_freq == 0:
                mean_loss = self._mean_loss(losses)
                msg = (f"Epoch {epoch + 1} of {n_epoch} took "
                       f"{time.time() - t0:.2f}s | train loss: {mean_loss:.4f}")
                if self.metrics is not None:
                    msg += f" | train acc: {self.metrics.result():.4f}"
                if skipped:
                    msg += f" | nan_guard skipped {skipped} step(s)"
                print(msg)
                if test_dataset is not None:
                    print(f"   val: {self.evaluate(test_dataset)}")
        self._sync_to_network()
        return self

    def _train_rich(self, n_epoch, train_dataset, test_dataset, print_freq,
                    max_steps_per_epoch):
        from rich.progress import (BarColumn, Progress, TextColumn,
                                   TimeElapsedColumn, TimeRemainingColumn)

        with Progress(TextColumn("[progress.description]{task.description}"),
                      BarColumn(),
                      TextColumn("{task.percentage:>3.0f}%"),
                      TimeRemainingColumn(), TimeElapsedColumn()) as prog:
            n_batch = len(train_dataset) if hasattr(train_dataset, "__len__") \
                else None
            etask = prog.add_task("[red]Epochs", total=n_epoch)
            btask = prog.add_task("[green]Batches", total=n_batch)
            for epoch in range(n_epoch):
                prog.reset(btask, total=n_batch)
                if self.metrics is not None:
                    self.metrics.reset()
                losses = []
                from ..data.loader import device_prefetch

                for bi, (x, y) in enumerate(
                        device_prefetch(train_dataset, self._put_batch)):
                    if (max_steps_per_epoch is not None and
                            bi >= max_steps_per_epoch):
                        break
                    (self.params, self.state, self.opt_state, self.ema_params,
                     loss, out
                     ) = self._train_step(self.params, self.state,
                                          self.opt_state, self.ema_params,
                                          x, y, self._next_key(),
                                          epoch_id=self._epoch_bucket(epoch))
                    self.step += 1
                    losses.append(loss)
                    if self.metrics is not None and not self._skipped(loss):
                        self.metrics.update(_host(out), _host(y))
                    prog.advance(btask)
                self._count_skips(losses)
                mean_loss = self._mean_loss(losses)
                desc = f"[red]Epochs (loss {mean_loss:.4f}"
                if self.metrics is not None:
                    desc += f", metric {self.metrics.result():.4f}"
                prog.update(etask, description=desc + ")")
                prog.advance(etask)
        self._sync_to_network()
        return self

    def evaluate(self, dataset, max_batches: tp.Optional[int] = None):
        losses = []
        if self.metrics is not None:
            self.metrics.reset()
        for bi, (x, y) in enumerate(dataset):
            if max_batches is not None and bi >= max_batches:
                break
            x, y = self._put_batch((x, y))
            loss, out = self._eval_loss_step(self.eval_params, self.state,
                                             x, y)
            losses.append(loss)
            if self.metrics is not None:
                self.metrics.update(_host(out), _host(y))
        result = {"loss": float(jnp.mean(jnp.stack(losses))) if losses else 0.0}
        if self.metrics is not None:
            result["metric"] = self.metrics.result()
        return result

    @property
    def eval_params(self):
        """Params used for evaluate/predict/save: the EMA average when
        enabled (the PaddleDet serving convention), else the raw ones."""
        return self.ema_params if self.ema_for_eval else self.params

    def predict(self, inputs):
        x = jnp.asarray(inputs)
        return self._eval_step(self.eval_params, self.state, x)

    # ------------------------------------------------------------------
    def _sync_to_network(self):
        """Write trained arrays back into the live module (for
        network.save_weights / eager use)."""
        merged = {**self.eval_params, **self.state}
        load_state_dict(self.network, merged, strict=False)

    def save_weights(self, path: str):
        self._sync_to_network()
        self.network.save_weights(path)

    # full train-state checkpoint (params + BN stats + optimizer + EMA +
    # step) — exact resume, unlike the weights-only save above
    def _ckpt_extra(self):
        # the trainer's own loop state rides along: without the RNG key
        # a resumed run's dropout/augmentation stream restarts from the
        # seed and diverges from the uninterrupted run at the first batch
        extra = {"trainer": {
            "key": np.asarray(jax.random.key_data(self._key)),
            "nan_skips": np.asarray(self.nan_skips),
        }}
        if self.ema_params is not None:
            extra["ema"] = self.ema_params
        return extra

    def save_checkpoint(self, path: str):
        from ..utils.checkpoint import TrainCheckpoint

        TrainCheckpoint.save(path, self.params, self.state, self.opt_state,
                             self.step, extra=self._ckpt_extra())

    def restore_checkpoint(self, path: str):
        from ..utils.checkpoint import TrainCheckpoint

        out = TrainCheckpoint.restore(path, self.params, self.state,
                                      self.opt_state,
                                      extra=self._ckpt_extra())

        # re-place every restored leaf on its template's sharding: under
        # param_sharding="fsdp" the live params/opt/EMA are ZeRO-3
        # sharded over the mesh, and feeding replicated host arrays back
        # into the donated train step would silently re-replicate the
        # optimizer state (defeating the sharding) or break donation
        def _like(template, new):
            def put(t, n):
                sh = getattr(t, "sharding", None)
                a = jnp.asarray(n)
                if sh is not None and not sh.is_fully_replicated:
                    return jax.device_put(a, sh)
                return a  # replicated: stay uncommitted, jit places it
            return jax.tree_util.tree_map(put, template, new)

        self.params = _like(self.params, out[0])
        self.state = _like(self.state, out[1])
        self.opt_state = _like(self.opt_state, out[2])
        self.step = out[3]
        extra = out[4]
        self._key = jax.random.wrap_key_data(
            jnp.asarray(extra["trainer"]["key"]))
        self.nan_skips = int(extra["trainer"]["nan_skips"])
        if "ema" in extra:
            self.ema_params = _like(self.ema_params, extra["ema"])
        return self

    def load_weights(self, path: str):
        self.network.load_weights(path)
        self.params, self.state = split(self.network)
        if getattr(self, "param_shardings", None):
            # re-apply ZeRO-3 placement — split() returns host arrays,
            # and opt/ema must inherit the sharded layout
            from ..parallel.mesh import place_params

            self.params = place_params(self.params, self.param_shardings)
        self.opt_state = self.optimizer.init(self.params)
        if self.ema_decay is not None:
            self.ema_params = dict(self.params)


Model = Trainer  # reference spelling: tlx.model.Model
