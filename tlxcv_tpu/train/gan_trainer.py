"""GAN trainer: alternating D/G updates in one jitted step
(replaces the per-backend eager loops in reference demo/gan/train.py:24-120).

Works with any model exposing ``__call__(real) -> fake`` plus
``d_loss(real, fake)`` / ``g_loss(fake)`` (DCGAN-style) or paired
``g_loss(real_a, real_b)`` / ``d_loss(real_a, real_b)`` (CycleGAN-style).
Generator/discriminator params are split by path prefix (netG*/netD*).
"""
from __future__ import annotations

import time
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core.module import Module, Rngs, load_state_dict, pure, split


class GANTrainer:
    def __init__(self, network: Module, optimizer_g=None, optimizer_d=None,
                 seed: int = 0):
        self.network = network
        self.opt_g = optimizer_g or optax.adam(2e-4, b1=0.5)
        self.opt_d = optimizer_d or optax.adam(2e-4, b1=0.5)
        params, self.state = split(network)
        self.params_g = {k: v for k, v in params.items() if not k.startswith("netD")}
        self.params_d = {k: v for k, v in params.items() if k.startswith("netD")}
        self.og = self.opt_g.init(self.params_g)
        self.od = self.opt_d.init(self.params_d)
        self._key = jax.random.key(seed)

        # CycleGAN-style models expose paired g_loss(real_a, real_b);
        # DCGAN-style expose g_loss(fake) — detect by arity.
        import inspect

        try:
            g_arity = sum(
                p.default is inspect.Parameter.empty
                and p.kind in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD)
                for p in inspect.signature(network.g_loss).parameters.values())
        except (AttributeError, ValueError):
            g_arity = 1
        self.paired = g_arity >= 2

        if self.paired:
            def d_call(m, a, b):
                return m.d_loss(a, b)

            def g_call(m, a, b):
                return m.g_loss(a, b)
        else:
            def d_call(m, real):
                fake = m(real)
                return m.d_loss(real, fake)

            def g_call(m, real):
                fake = m(real)
                return m.g_loss(fake)

        self._d_pure = pure(network, d_call)
        self._g_pure = pure(network, g_call)

        opt_g, opt_d = self.opt_g, self.opt_d
        d_pure, g_pure = self._d_pure, self._g_pure

        @jax.jit
        def step(pg, pd, og, od, state, reals, key):
            kd, kg = jax.random.split(key)

            def d_loss_fn(pd):
                loss, new_state = d_pure({**pg, **pd}, state, *reals,
                                         training=True, rngs=Rngs(noise=kd))
                return loss, new_state

            (dl, state), gd = jax.value_and_grad(d_loss_fn, has_aux=True)(pd)
            gd = {k: v for k, v in gd.items() if k.startswith("netD")}
            ud, od = opt_d.update(gd, od, pd)
            pd = optax.apply_updates(pd, ud)

            def g_loss_fn(pg):
                loss, new_state = g_pure({**pg, **pd}, state, *reals,
                                         training=True, rngs=Rngs(noise=kg))
                return loss, new_state

            (gl, state), gg = jax.value_and_grad(g_loss_fn, has_aux=True)(pg)
            gg = {k: v for k, v in gg.items() if not k.startswith("netD")}
            ug, og = opt_g.update(gg, og, pg)
            pg = optax.apply_updates(pg, ug)
            return pg, pd, og, od, state, dl, gl

        self._step = step

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def train(self, n_epoch, train_dataset, print_freq=1,
              max_steps_per_epoch=None, val_dataset=None, validator=None,
              val_sample_fn=None, val_max_batches=None):
        """``validator`` is a :class:`~tlxcv_tpu.train.gan_validate.GanValidator`
        (built from a config's ``validate:`` block); when given together
        with ``val_dataset`` it runs every ``validator.interval`` steps
        (or at every epoch end if the interval is 0) and the last scores
        land in ``self.val_results``."""
        validator = validator or getattr(self, "validator", None)
        sample = val_sample_fn or self._default_val_sample
        step_i = 0
        for epoch in range(n_epoch):
            t0 = time.time()
            dls, gls = [], []
            for bi, batch in enumerate(train_dataset):
                if max_steps_per_epoch is not None and bi >= max_steps_per_epoch:
                    break
                if self.paired:
                    reals = (jnp.asarray(batch[0]), jnp.asarray(batch[1]))
                else:
                    reals = (jnp.asarray(
                        batch[0] if isinstance(batch, (tuple, list))
                        else batch),)
                (self.params_g, self.params_d, self.og, self.od, self.state,
                 dl, gl) = self._step(self.params_g, self.params_d, self.og,
                                      self.od, self.state, reals,
                                      self._next_key())
                dls.append(float(dl))
                gls.append(float(gl))
                step_i += 1
                if (validator is not None and val_dataset is not None
                        and validator.interval > 0
                        and step_i % validator.interval == 0):
                    self._validate(validator, sample, val_dataset,
                                   val_max_batches)
            if (epoch + 1) % print_freq == 0:
                print(f"Epoch {epoch + 1}/{n_epoch} "
                      f"({time.time() - t0:.1f}s) "
                      f"D: {np.mean(dls):.4f} G: {np.mean(gls):.4f}")
            if (validator is not None and val_dataset is not None
                    and validator.interval == 0):
                self._validate(validator, sample, val_dataset, val_max_batches)
        self._sync_to_network()
        return self

    def _default_val_sample(self, batch):
        """Paired image batch (input, target) -> (G(input), target); an
        (images, labels) or bare batch -> (G(x), x) — the FID real/fake
        convention."""
        if isinstance(batch, (tuple, list)) and len(batch) >= 2 \
                and np.ndim(batch[1]) >= 3:
            inp, tgt = batch[0], batch[1]
        else:
            inp = tgt = batch[0] if isinstance(batch, (tuple, list)) else batch
        return np.asarray(self.generate(inp)), np.asarray(tgt)

    def _validate(self, validator, sample, val_dataset, max_batches):
        self.val_results = validator.run(sample, val_dataset,
                                         max_batches=max_batches)
        line = " ".join(f"{k}: {v:.4f}" for k, v in self.val_results.items())
        print(f"validate | {line}")
        return self.val_results

    def generate(self, batch_or_noise):
        # Build the pure generator forward ONCE and jit it: generate() is
        # called per validation batch, and rebuilding pure(...) each call
        # would re-trace the full generator every time (advisor r2).
        if not hasattr(self, "_gen_jit"):
            fwd = pure(self.network)

            def run(params, state, x, key):
                out, _ = fwd(params, state, x, rngs=Rngs(noise=key))
                return out

            self._gen_jit = jax.jit(run)
        return self._gen_jit({**self.params_g, **self.params_d}, self.state,
                             jnp.asarray(batch_or_noise), self._next_key())

    def _sync_to_network(self):
        merged = {**self.params_g, **self.params_d, **self.state}
        load_state_dict(self.network, merged, strict=False)

    def save_weights(self, path):
        self._sync_to_network()
        self.network.save_weights(path)
