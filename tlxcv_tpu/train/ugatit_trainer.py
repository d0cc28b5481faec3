"""UGATIT full training driver (reference ships predict-only for UGATIT;
recipe follows the UGATIT paper / PaddleGAN ugatit config the reference
weights were trained with: LSGAN adversarial on global+local
discriminators, cycle x10, identity x10, CAM BCE x1000, rho clipping —
VERDICT r1 item 8)."""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core.module import Module, Rngs, load_state_dict, pure, split


def _mse(x, target):
    return jnp.mean((x - target) ** 2)


def _bce_logits(x, target):
    return jnp.mean(optax.sigmoid_binary_cross_entropy(
        x, jnp.full_like(x, target)))


class UGATITNets(Module):
    """genA2B/genB2A + global/local discriminators per domain
    (reference ugatit_model.py :44-51)."""

    def __init__(self, generator=None, disc_global=None, disc_local=None):
        from ..models.gan.ugatit import UGATITDiscriminator, UGATITGenerator

        gcfg = generator or {}
        self.genA2B = UGATITGenerator(**gcfg)
        self.genB2A = UGATITGenerator(**gcfg)
        dg = disc_global if disc_global is not None else {"n_layers": 7}
        dl = disc_local if disc_local is not None else {"n_layers": 5}
        self.disGA = UGATITDiscriminator(**dg)
        self.disGB = UGATITDiscriminator(**dg)
        self.disLA = UGATITDiscriminator(**dl)
        self.disLB = UGATITDiscriminator(**dl)

    def __call__(self, real_a):
        fake, _, _ = self.genA2B(real_a)
        return fake


class UGATITTrainer:
    def __init__(self, nets: UGATITNets, lr=1e-4, weight_decay=1e-4,
                 adv_weight=1.0, cycle_weight=10.0, identity_weight=10.0,
                 cam_weight=1000.0, seed=0):
        self.nets = nets
        params, self.state = split(nets)
        is_d = lambda k: k.startswith(("disGA", "disGB", "disLA", "disLB"))
        self.pg = {k: v for k, v in params.items() if not is_d(k)}
        self.pd = {k: v for k, v in params.items() if is_d(k)}
        self.opt_g = optax.adamw(lr, b1=0.5, b2=0.999,
                                 weight_decay=weight_decay)
        self.opt_d = optax.adamw(lr, b1=0.5, b2=0.999,
                                 weight_decay=weight_decay)
        self.og = self.opt_g.init(self.pg)
        self.od = self.opt_d.init(self.pd)
        self._key = jax.random.key(seed)

        def d_losses(m, real_a, real_b):
            fake_a2b, _, _ = m.genA2B(real_a)
            fake_b2a, _, _ = m.genB2A(real_b)
            fake_a2b = jax.lax.stop_gradient(fake_a2b)
            fake_b2a = jax.lax.stop_gradient(fake_b2a)
            loss = 0.0
            for disc, real, fake in ((m.disGA, real_a, fake_b2a),
                                     (m.disLA, real_a, fake_b2a),
                                     (m.disGB, real_b, fake_a2b),
                                     (m.disLB, real_b, fake_a2b)):
                r_logit, r_cam, _ = disc(real)
                f_logit, f_cam, _ = disc(fake)
                loss += _mse(r_logit, 1.0) + _mse(f_logit, 0.0)
                loss += _mse(r_cam, 1.0) + _mse(f_cam, 0.0)
            return adv_weight * loss

        def g_losses(m, real_a, real_b):
            fake_a2b, cam_ab, _ = m.genA2B(real_a)
            fake_b2a, cam_ba, _ = m.genB2A(real_b)
            rec_a, _, _ = m.genB2A(fake_a2b)
            rec_b, _, _ = m.genA2B(fake_b2a)
            idt_a, cam_aa, _ = m.genB2A(real_a)   # identity: B2A on A
            idt_b, cam_bb, _ = m.genA2B(real_b)

            adv = 0.0
            for disc, fake in ((m.disGB, fake_a2b), (m.disLB, fake_a2b),
                               (m.disGA, fake_b2a), (m.disLA, fake_b2a)):
                f_logit, f_cam, _ = disc(fake)
                adv += _mse(f_logit, 1.0) + _mse(f_cam, 1.0)
            cyc = (jnp.abs(rec_a - real_a).mean()
                   + jnp.abs(rec_b - real_b).mean())
            idt = (jnp.abs(idt_a - real_a).mean()
                   + jnp.abs(idt_b - real_b).mean())
            # CAM: translated logits -> 1, identity logits -> 0
            cam = (_bce_logits(cam_ab, 1.0) + _bce_logits(cam_aa, 0.0)
                   + _bce_logits(cam_ba, 1.0) + _bce_logits(cam_bb, 0.0))
            return (adv_weight * adv + cycle_weight * cyc
                    + identity_weight * idt + cam_weight * cam)

        d_pure = pure(nets, d_losses)
        g_pure = pure(nets, g_losses)
        opt_g, opt_d = self.opt_g, self.opt_d

        @jax.jit
        def step(pg, pd, og, od, state, real_a, real_b):
            def d_fn(pd):
                loss, ns = d_pure({**pg, **pd}, state, real_a, real_b,
                                  training=True)
                return loss, ns

            (dl, state), gd = jax.value_and_grad(d_fn, has_aux=True)(pd)
            gd = {k: v for k, v in gd.items() if is_d(k)}
            ud, od = opt_d.update(gd, od, pd)
            pd = optax.apply_updates(pd, ud)

            def g_fn(pg):
                loss, ns = g_pure({**pg, **pd}, state, real_a, real_b,
                                  training=True)
                return loss, ns

            (gl, state), gg = jax.value_and_grad(g_fn, has_aux=True)(pg)
            gg = {k: v for k, v in gg.items() if not is_d(k)}
            ug, og = opt_g.update(gg, og, pg)
            pg = optax.apply_updates(pg, ug)
            # rho clipping [0, 1] (reference RhoClipper)
            pg = {k: (jnp.clip(v, 0.0, 1.0) if k.endswith("rho") else v)
                  for k, v in pg.items()}
            return pg, pd, og, od, state, dl, gl

        self._step = step

    def train(self, n_epoch, train_dataset, print_freq=1,
              max_steps_per_epoch=None):
        for epoch in range(n_epoch):
            t0 = time.time()
            dls, gls = [], []
            for bi, batch in enumerate(train_dataset):
                if (max_steps_per_epoch is not None
                        and bi >= max_steps_per_epoch):
                    break
                real_a, real_b = jnp.asarray(batch[0]), jnp.asarray(batch[1])
                (self.pg, self.pd, self.og, self.od, self.state, dl, gl
                 ) = self._step(self.pg, self.pd, self.og, self.od,
                                self.state, real_a, real_b)
                dls.append(float(dl))
                gls.append(float(gl))
            if (epoch + 1) % print_freq == 0:
                print(f"Epoch {epoch + 1}/{n_epoch} "
                      f"({time.time() - t0:.1f}s) D: {np.mean(dls):.4f} "
                      f"G: {np.mean(gls):.4f}")
        self._sync_to_network()
        return self

    def _sync_to_network(self):
        load_state_dict(self.nets, {**self.pg, **self.pd, **self.state},
                        strict=False)

    def save_weights(self, path):
        self._sync_to_network()
        self.nets.save_weights(path)
