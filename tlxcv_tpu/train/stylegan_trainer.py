"""StyleGANv2 training driver with lazy R1 + path-length regularization
(reference tlxcv/models/gan/configs/stylegan_v2_256_ffhq.yaml semantics:
logistic GAN loss, r1_reg_weight=10 every disc_iters=16 steps,
path_reg_weight=2 with path_batch_shrink=2 every gen_iters=4 steps,
Adam(beta1=0, beta2=0.99*reg_ratio) per optimizer — VERDICT r1 item 8).

All four step kinds (d, d_reg, g, g_reg) are separate jitted functions;
the driver interleaves them at the configured cadence, so no step ever
retraces.  The path-length EMA rides through the jitted g_reg step as a
carried scalar.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core.module import Rngs, load_state_dict, pure, split


def _logistic_d_loss(real_pred, fake_pred):
    return (jax.nn.softplus(-real_pred) + jax.nn.softplus(fake_pred)).mean()


def _logistic_g_loss(fake_pred):
    return jax.nn.softplus(-fake_pred).mean()


class StyleGANv2Trainer:
    def __init__(self, generator, discriminator, lr=0.002,
                 r1_weight=10.0, path_reg_weight=2.0, g_reg_every=4,
                 d_reg_every=16, path_batch_shrink=2, seed=0):
        self.g = generator
        self.d = discriminator
        self.g_reg_every = g_reg_every
        self.d_reg_every = d_reg_every
        self.path_batch_shrink = path_batch_shrink
        self.mean_path_length = jnp.zeros(())

        g_ratio = g_reg_every / (g_reg_every + 1)
        d_ratio = d_reg_every / (d_reg_every + 1)
        # lazy-regularization-adjusted moments (the yaml's 0.792 /
        # 0.93176 are 0.99 * reg_ratio)
        self.opt_g = optax.adam(lr * g_ratio, b1=0.0, b2=0.99 * g_ratio)
        self.opt_d = optax.adam(lr * d_ratio, b1=0.0, b2=0.99 * d_ratio)

        self.pg, self.sg = split(generator)
        self.pd, self.sd = split(discriminator)
        self.og = self.opt_g.init(self.pg)
        self.od = self.opt_d.init(self.pd)
        self._key = jax.random.key(seed)

        g_fwd = pure(generator)
        g_map = pure(generator, "mapping")
        g_syn = pure(generator, "synthesis")
        d_fwd = pure(discriminator)
        opt_g, opt_d = self.opt_g, self.opt_d

        @jax.jit
        def d_step(pg, sg, pd, sd, od, real, key):
            kz, kn = jax.random.split(key)
            z = jax.random.normal(kz, (real.shape[0], generator.style_dim))
            fake, _ = g_fwd(pg, sg, z, training=True, rngs=Rngs(noise=kn))

            def lf(pd):
                fp, _ = d_fwd(pd, sd, jax.lax.stop_gradient(fake),
                              training=True)
                rp, _ = d_fwd(pd, sd, real, training=True)
                return _logistic_d_loss(rp, fp)

            loss, grads = jax.value_and_grad(lf)(pd)
            upd, od = opt_d.update(grads, od, pd)
            return optax.apply_updates(pd, upd), od, loss

        @jax.jit
        def d_reg_step(pd, sd, od, real):
            def r1_fn(pd):
                def d_sum(x):
                    out, _ = d_fwd(pd, sd, x, training=True)
                    return out.sum()

                grad_real = jax.grad(d_sum)(real)
                r1 = jnp.sum(grad_real ** 2, axis=(1, 2, 3)).mean()
                # 0-weight logit term keeps every D param in the graph
                out, _ = d_fwd(pd, sd, real, training=True)
                return (r1_weight / 2 * r1 * d_reg_every
                        + 0.0 * out.mean()), r1

            (loss, r1), grads = jax.value_and_grad(r1_fn, has_aux=True)(pd)
            upd, od = opt_d.update(grads, od, pd)
            return optax.apply_updates(pd, upd), od, r1

        from functools import partial

        @partial(jax.jit, static_argnames=("batch_size",))
        def g_step(pg, sg, pd, sd, og, key, batch_size):
            kz, kn = jax.random.split(key)
            z = jax.random.normal(kz, (batch_size, generator.style_dim))

            def lf(pg):
                fake, _ = g_fwd(pg, sg, z, training=True, rngs=Rngs(noise=kn))
                fp, _ = d_fwd(pd, sd, fake, training=True)
                return _logistic_g_loss(fp)

            loss, grads = jax.value_and_grad(lf)(pg)
            upd, og = opt_g.update(grads, og, pg)
            return optax.apply_updates(pg, upd), og, loss

        @partial(jax.jit, static_argnames=("batch_size",))
        def g_reg_step(pg, sg, og, mean_pl, key, batch_size):
            kz, kn, ku = jax.random.split(key, 3)
            z = jax.random.normal(kz, (batch_size, generator.style_dim))

            def path_fn(pg):
                w, _ = g_map(pg, sg, z, training=True)
                fake, _ = g_syn(pg, sg, w, training=True,
                                rngs=Rngs(noise=kn))
                hw = fake.shape[1] * fake.shape[2]
                u = jax.random.normal(ku, fake.shape) / jnp.sqrt(hw)

                def img_dot(w_in):
                    f, _ = g_syn(pg, sg, w_in, training=True,
                                 rngs=Rngs(noise=kn))
                    return jnp.sum(f * u)

                jtu = jax.grad(img_dot)(w)               # [B, style_dim]
                pl = jnp.sqrt(jnp.sum(jtu ** 2, -1))     # per-sample lengths
                new_mean = mean_pl + 0.01 * (pl.mean() - mean_pl)
                penalty = ((pl - new_mean) ** 2).mean()
                return (path_reg_weight * g_reg_every * penalty
                        + 0.0 * fake.mean()), (pl.mean(), new_mean)

            (loss, (pl, new_mean)), grads = jax.value_and_grad(
                path_fn, has_aux=True)(pg)
            upd, og = opt_g.update(grads, og, pg)
            return optax.apply_updates(pg, upd), og, pl, new_mean

        self._d_step = d_step
        self._d_reg_step = d_reg_step
        self._g_step = g_step
        self._g_reg_step = g_reg_step

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def train(self, n_epoch, train_dataset, print_freq=1,
              max_steps_per_epoch=None):
        step = 0
        for epoch in range(n_epoch):
            t0 = time.time()
            dls, gls = [], []
            for bi, batch in enumerate(train_dataset):
                if (max_steps_per_epoch is not None
                        and bi >= max_steps_per_epoch):
                    break
                real = jnp.asarray(
                    batch[0] if isinstance(batch, (tuple, list)) else batch)
                b = real.shape[0]
                self.pd, self.od, dl = self._d_step(
                    self.pg, self.sg, self.pd, self.sd, self.od, real,
                    self._next_key())
                if step % self.d_reg_every == 0:
                    self.pd, self.od, _ = self._d_reg_step(
                        self.pd, self.sd, self.od, real)
                self.pg, self.og, gl = self._g_step(
                    self.pg, self.sg, self.pd, self.sd, self.og,
                    self._next_key(), batch_size=b)
                if step % self.g_reg_every == 0:
                    pb = max(1, b // self.path_batch_shrink)
                    (self.pg, self.og, _, self.mean_path_length
                     ) = self._g_reg_step(self.pg, self.sg, self.og,
                                          self.mean_path_length,
                                          self._next_key(), batch_size=pb)
                dls.append(float(dl))
                gls.append(float(gl))
                step += 1
            if (epoch + 1) % print_freq == 0:
                print(f"Epoch {epoch + 1}/{n_epoch} "
                      f"({time.time() - t0:.1f}s) D: {np.mean(dls):.4f} "
                      f"G: {np.mean(gls):.4f} "
                      f"pl_ema: {float(self.mean_path_length):.4f}")
        self._sync_to_network()
        return self

    def generate(self, z):
        fwd = pure(self.g)
        out, _ = fwd(self.pg, self.sg, jnp.asarray(z),
                     rngs=Rngs(noise=self._next_key()))
        return out

    def _sync_to_network(self):
        load_state_dict(self.g, {**self.pg, **self.sg}, strict=False)
        load_state_dict(self.d, {**self.pd, **self.sd}, strict=False)

    def save_weights(self, path):
        self._sync_to_network()
        import numpy as _np

        from ..utils.checkpoint import _savable

        arrs = {f"G/{k}": _np.asarray(v) for k, v in {**self.pg,
                                                      **self.sg}.items()}
        arrs.update({f"D/{k}": _np.asarray(v) for k, v in {**self.pd,
                                                           **self.sd}.items()})
        # _savable: npz silently corrupts ml_dtypes (bf16) leaves
        _np.savez(path, **_savable(arrs))
