"""Hermetic facial-landmark accuracy validation — no external data.

Procedural "sketch face" fixture: a canonical 68-point layout (jaw arc,
brows, nose, eyes, mouth) is pushed through a random similarity
transform (translation / scale / rotation) and rendered as line
segments; the transformed points are the GT landmarks, the rotation is
the GT roll.  PFLD is trained from scratch and scored with the task NME metric
(inter-ocular normalization) — the full landmark train -> predict ->
NME loop end to end, the analog of the detection and pose
accuracy_check demos.

Training uses a plain L2 objective: the reference pfld_loss weights the
landmark term by the euler-angle error (its hard-sample trick), which
collapses to ~zero here because the synthetic roll is learned almost
exactly — a property of the fixture, not the model (the weighted loss
has its own unit tests).

Run: python demo/facial_landmark_detection/accuracy_check.py

"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tlxcv_tpu.core import pure, split
from tlxcv_tpu.models.facial_landmark_detection.pfld import PFLD
from tlxcv_tpu.tasks.facial_landmark_detection import NME

SIZE = 112


def _template():
    """Canonical 68 points in [-1, 1]^2 (x right, y down)."""
    pts = []
    # jaw 0-16: lower arc
    th = np.linspace(np.pi * 0.15, np.pi * 0.85, 17)
    pts += [(np.cos(t) * 0.9, np.sin(t) * 0.9) for t in th][::-1]
    # brows 17-21 / 22-26
    for sgn in (-1, 1):
        xs = np.linspace(0.15, 0.65, 5) * sgn
        pts += [(x, -0.55 - 0.08 * np.cos((abs(x) - 0.4) * 4)) for x in xs]
    # nose 27-35: bridge + base
    pts += [(0.0, y) for y in np.linspace(-0.45, 0.05, 4)]
    pts += [(x, 0.12) for x in np.linspace(-0.15, 0.15, 5)]
    # eyes 36-41 / 42-47: hexagons
    for cx in (-0.4, 0.4):
        th6 = np.linspace(0, 2 * np.pi, 7)[:6]
        pts += [(cx + 0.13 * np.cos(t), -0.3 + 0.07 * np.sin(t))
                for t in th6]
    # mouth 48-67: two ellipses
    th12 = np.linspace(0, 2 * np.pi, 13)[:12]
    pts += [(0.28 * np.cos(t), 0.5 + 0.12 * np.sin(t)) for t in th12]
    th8 = np.linspace(0, 2 * np.pi, 9)[:8]
    pts += [(0.18 * np.cos(t), 0.5 + 0.06 * np.sin(t)) for t in th8]
    return np.asarray(pts, np.float32)  # [68, 2]


TEMPLATE = _template()
GROUPS = [range(0, 17), range(17, 22), range(22, 27), range(27, 31),
          range(31, 36), list(range(36, 42)) + [36],
          list(range(42, 48)) + [42], list(range(48, 60)) + [48],
          list(range(60, 68)) + [60]]


def _draw_line(img, p, q):
    n = int(max(abs(q[0] - p[0]), abs(q[1] - p[1]))) + 1
    xs = np.linspace(p[0], q[0], n).astype(int)
    ys = np.linspace(p[1], q[1], n).astype(int)
    ok = (xs >= 0) & (xs < SIZE) & (ys >= 0) & (ys < SIZE)
    img[ys[ok], xs[ok]] = 1.0


def sample(rng, n):
    imgs = np.asarray(rng.uniform(0, 0.2, size=(n, SIZE, SIZE, 3)),
                      np.float32)
    lms = np.zeros((n, 68, 2), np.float32)
    rolls = np.zeros((n,), np.float32)
    for i in range(n):
        scale = rng.uniform(0.28, 0.42) * SIZE
        rot = rng.uniform(-0.4, 0.4)
        cx = rng.uniform(0.4, 0.6) * SIZE
        cy = rng.uniform(0.4, 0.6) * SIZE
        c, s = np.cos(rot), np.sin(rot)
        R = np.asarray([[c, -s], [s, c]], np.float32)
        pts = TEMPLATE @ R.T * scale + (cx, cy)
        color = rng.uniform(0.7, 1.0)
        for g in GROUPS:
            g = list(g)
            for a, b in zip(g[:-1], g[1:]):
                _draw_line(imgs[i, :, :, 0], pts[a], pts[b])
        imgs[i, :, :, 1] = imgs[i, :, :, 0] * color
        imgs[i, :, :, 2] = imgs[i, :, :, 0] * (1 - color)
        lms[i] = pts / SIZE                    # normalized [0, 1]
        rolls[i] = np.degrees(rot)
    eulers = np.stack([np.zeros_like(rolls), np.zeros_like(rolls), rolls],
                      -1)
    return imgs, lms.reshape(n, -1), eulers


def main():
    model = PFLD(num_landmarks=68)
    params, state = split(model)
    def plain_l2(m, x, lm, eu):
        landmarks, features = m(x)
        angle = m.auxiliarynet(features)
        ang_loss = jnp.mean(jnp.sum((angle - eu) ** 2, -1))
        b = landmarks.shape[0]
        lm_loss = jnp.mean(jnp.sum(
            (landmarks.reshape(b, -1) - lm.reshape(b, -1)) ** 2, -1))
        return lm_loss + 0.01 * ang_loss

    lp = pure(model, plain_l2)
    fwd = pure(model)
    tx = optax.adam(optax.cosine_decay_schedule(1e-3, 4000, 1e-2))
    opt_state = tx.init(params)

    @jax.jit
    def step(params, state, opt_state, x, lm, eu):
        def lf(p):
            loss, ns = lp(p, state, x, lm, eu, training=True)
            return loss, ns

        (loss, state), g = jax.value_and_grad(lf, has_aux=True)(params)
        u, opt_state = tx.update(g, opt_state)
        return optax.apply_updates(params, u), state, opt_state, loss

    rng = np.random.default_rng(0)
    t0 = time.time()
    for it in range(4000):
        x, lm, eu = sample(rng, 32)
        params, state, opt_state, loss = step(
            params, state, opt_state, jnp.asarray(x), jnp.asarray(lm),
            jnp.asarray(eu))
        if it % 250 == 0:
            print(f"it {it} loss {float(loss):.4f} ({time.time()-t0:.0f}s)",
                  flush=True)

    @jax.jit
    def predict(params, state, x):
        (lm, _), _ = fwd(params, state, x, training=False)
        return lm

    nme = NME(num_points=68)
    vrng = np.random.default_rng(999)
    for _ in range(4):
        x, lm, _ = sample(vrng, 32)
        pred = predict(params, state, jnp.asarray(x))
        nme.update(np.asarray(pred, np.float32), lm)
    print(f"NME (inter-ocular) = {nme.result():.4f}")


if __name__ == "__main__":
    main()
