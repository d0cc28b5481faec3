"""Hermetic face-verification accuracy validation — no external data.

Procedural *identity* fixture: each identity is a deformation of the
68-point sketch-face template (jaw width, eye spacing/size, brow
height, nose length, mouth geometry — drawn once from the identity
seed); each sample renders that identity under per-sample nuisance
(similarity transform, line color, background noise, point jitter).
ArcFace (reference tlxcv/models/face_recognition/arcface.py) is trained
from scratch with the additive-angular-margin head on a closed set of
identities, then scored with the real verification protocol on
DISJOINT identities: embed held-out samples, cosine-score same/different
pairs, pick the threshold on a validation split, report accuracy on the
test split (the LFW protocol shape, reference demo/face_recognition).

Bar: verification accuracy >= 0.93 on unseen identities.

Run: python demo/face_recognition/accuracy_check.py
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
from tlxcv_tpu.models.classification.resnet import ResNet
from tlxcv_tpu.models.face_recognition import ArcFace

SIZE = 64
N_TRAIN_IDS = 64
BAR = 0.93


def _template():
    """Canonical 68 points in [-1, 1]^2 (same layout as the landmark
    fixture, demo/facial_landmark_detection/accuracy_check.py)."""
    pts = []
    th = np.linspace(np.pi * 0.15, np.pi * 0.85, 17)
    pts += [(np.cos(t) * 0.9, np.sin(t) * 0.9) for t in th][::-1]
    for sgn in (-1, 1):
        xs = np.linspace(0.15, 0.65, 5) * sgn
        pts += [(x, -0.55 - 0.08 * np.cos((abs(x) - 0.4) * 4)) for x in xs]
    pts += [(0.0, y) for y in np.linspace(-0.45, 0.05, 4)]
    pts += [(x, 0.12) for x in np.linspace(-0.15, 0.15, 5)]
    for cx in (-0.4, 0.4):
        th6 = np.linspace(0, 2 * np.pi, 7)[:6]
        pts += [(cx + 0.13 * np.cos(t), -0.3 + 0.07 * np.sin(t))
                for t in th6]
    th12 = np.linspace(0, 2 * np.pi, 13)[:12]
    pts += [(0.28 * np.cos(t), 0.5 + 0.12 * np.sin(t)) for t in th12]
    th8 = np.linspace(0, 2 * np.pi, 9)[:8]
    pts += [(0.18 * np.cos(t), 0.5 + 0.06 * np.sin(t)) for t in th8]
    return np.asarray(pts, np.float32)


TEMPLATE = _template()
GROUPS = [range(0, 17), range(17, 22), range(22, 27), range(27, 31),
          range(31, 36), list(range(36, 42)) + [36],
          list(range(42, 48)) + [42], list(range(48, 60)) + [48],
          list(range(60, 68)) + [60]]
JAW, LBROW, RBROW = range(0, 17), range(17, 22), range(22, 27)
NOSE_BR, NOSE_BASE = range(27, 31), range(31, 36)
LEYE, REYE, MOUTH = range(36, 42), range(42, 48), range(48, 68)


def identity_template(identity_seed):
    """Deform the canonical template with identity-seeded geometry."""
    rng = np.random.default_rng((917, identity_seed))
    pts = TEMPLATE.copy()
    jaw_w = rng.uniform(0.8, 1.2)
    pts[JAW, 0] *= jaw_w
    eye_gap = rng.uniform(0.78, 1.25)
    eye_size = rng.uniform(0.7, 1.4)
    eye_y = rng.uniform(-0.06, 0.06)
    for eye, cx in ((LEYE, -0.4), (REYE, 0.4)):
        c = np.asarray([cx * eye_gap, -0.3 + eye_y], np.float32)
        pts[eye] = (pts[eye] - (cx, -0.3)) * eye_size + c
    brow_y = rng.uniform(-0.08, 0.08)
    pts[LBROW, 1] += brow_y
    pts[RBROW, 1] += brow_y
    pts[LBROW, 0] *= eye_gap
    pts[RBROW, 0] *= eye_gap
    nose_len = rng.uniform(0.85, 1.25)
    pts[NOSE_BR, 1] = -0.45 + (pts[NOSE_BR, 1] + 0.45) * nose_len
    base_y = pts[NOSE_BR, 1].max() + 0.07
    pts[NOSE_BASE, 1] = base_y
    pts[NOSE_BASE, 0] *= rng.uniform(0.7, 1.3)
    mw = rng.uniform(0.75, 1.3)
    mh = rng.uniform(0.7, 1.4)
    my = rng.uniform(0.44, 0.56)
    pts[MOUTH, 0] *= mw
    pts[MOUTH, 1] = my + (pts[MOUTH, 1] - 0.5) * mh
    return pts


# all polyline segments as index pairs, for one-shot vectorized raster
_SEG_A = np.asarray([a for g in GROUPS for a in list(g)[:-1]])
_SEG_B = np.asarray([b for g in GROUPS for b in list(g)[1:]])
_T = np.linspace(0.0, 1.0, 32, dtype=np.float32)  # >= max segment length px


def _draw_face(img, pts):
    """Rasterize every segment at once (the per-segment python loop was
    the host bottleneck of the TPU run; 32 samples/segment marks the
    same 8-connected cells — segments here are <= ~10 px)."""
    P, Q = pts[_SEG_A], pts[_SEG_B]
    xs = (P[:, 0:1] + (Q[:, 0:1] - P[:, 0:1]) * _T).astype(int).ravel()
    ys = (P[:, 1:2] + (Q[:, 1:2] - P[:, 1:2]) * _T).astype(int).ravel()
    ok = (xs >= 0) & (xs < SIZE) & (ys >= 0) & (ys < SIZE)
    img[ys[ok], xs[ok]] = 1.0


def render(identity_seed, rng):
    """One sample of an identity under per-sample nuisance."""
    img = np.asarray(rng.uniform(0, 0.2, size=(SIZE, SIZE, 3)), np.float32)
    pts = identity_template(identity_seed)
    pts = pts + rng.normal(0, 0.008, size=pts.shape)  # point jitter
    scale = rng.uniform(0.3, 0.42) * SIZE
    rot = rng.uniform(-0.3, 0.3)
    c, s = np.cos(rot), np.sin(rot)
    R = np.asarray([[c, -s], [s, c]], np.float32)
    ctr = (rng.uniform(0.42, 0.58) * SIZE, rng.uniform(0.42, 0.58) * SIZE)
    pts = pts @ R.T * scale + ctr
    color = rng.uniform(0.7, 1.0)
    _draw_face(img[:, :, 0], pts)
    img[:, :, 1] = img[:, :, 0] * color
    img[:, :, 2] = img[:, :, 0] * (1 - color)
    return img


def batch(rng, n, id_pool):
    ids = rng.integers(0, len(id_pool), size=n)
    imgs = np.stack([render(id_pool[i], rng) for i in ids])
    return jnp.asarray(imgs), jnp.asarray(ids, jnp.int32)


def _verify(embed_fn, params, state, id_base, seed):
    """LFW-protocol verification accuracy on identities id_base+i
    (disjoint from training): embed, score all same/diff cosine pairs,
    pick the threshold on the val half, report accuracy on the test
    half.  Returns (acc, threshold, n_pos)."""
    n_ids, per = 16, 8
    eval_rng = np.random.default_rng(seed)
    embs = None
    for i in range(n_ids):
        imgs = np.stack([render(id_base + i, eval_rng) for _ in range(per)])
        e = np.asarray(embed_fn(params, state, jnp.asarray(imgs)))
        if embs is None:   # sized from the model, not a hardcoded dim
            embs = np.zeros((n_ids, per, e.shape[-1]), np.float32)
        embs[i] = e

    pos, neg = [], []
    for i in range(n_ids):
        for a in range(per):
            for b in range(a + 1, per):
                pos.append(float(embs[i, a] @ embs[i, b]))
    pair_rng = np.random.default_rng(7)
    while len(neg) < len(pos):
        i, j = pair_rng.integers(0, n_ids, size=2)
        if i != j:
            neg.append(float(embs[i, pair_rng.integers(0, per)]
                             @ embs[j, pair_rng.integers(0, per)]))
    scores = np.asarray(pos + neg, np.float32)
    labels = np.asarray([1] * len(pos) + [0] * len(neg))
    perm = pair_rng.permutation(len(scores))
    scores, labels = scores[perm], labels[perm]
    half = len(scores) // 2
    cands = np.unique(scores[:half])
    accs = [(np.mean((scores[:half] >= t) == labels[:half]), t)
            for t in cands]
    best_t = max(accs)[1]
    acc = float(np.mean((scores[half:] >= best_t) == labels[half:]))
    return acc, best_t, len(pos)


def main(steps=4000, batch_size=64, n_train_ids=N_TRAIN_IDS):
    model = ArcFace(input_size=SIZE, embed_size=128,
                    num_classes=n_train_ids,
                    backbone=ResNet(depth=18, num_classes=0, with_pool=False))
    params, state = split(model)
    # loss path: embeds -> margin head -> CE (arcface.py loss_fn); the
    # margin is warm-ramped 0 -> 0.5 over the first 40% of training —
    # at init the full margin at logit scale 64 puts the target logit
    # ~30 below the others (observed CE ~44) and stalls early training.
    lp = pure(model, lambda m, x, y, mg: m.loss_fn(m.embed(x), y, margin=mg))
    emb = pure(model, "embed")
    sched = optax.cosine_decay_schedule(1e-3, steps)
    tx = optax.adam(sched)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, state, opt_state, x, y, mg, key):
        def lf(p):
            loss, ns = lp(p, state, x, y, mg, training=True, rngs=key)
            return loss.mean(), ns

        (loss, state), g = jax.value_and_grad(lf, has_aux=True)(params)
        u, opt_state = tx.update(g, opt_state)
        return optax.apply_updates(params, u), state, opt_state, loss

    embed = jax.jit(lambda p, s, x: emb(p, s, x, training=False)[0])
    rng = np.random.default_rng(0)
    train_ids = list(range(n_train_ids))
    key = jax.random.key(0)
    t0 = time.time()
    warm = int(steps * 0.4)
    it = 0
    for it in range(steps):
        x, y = batch(rng, batch_size, train_ids)
        key, sub = jax.random.split(key)
        mg = jnp.float32(0.5 * min(1.0, it / max(1, warm)))
        params, state, opt_state, loss = step(params, state, opt_state,
                                              x, y, mg, sub)
        if it % 250 == 0:
            print(f"[arcface] it {it} loss {float(loss):.4f} "
                  f"margin {float(mg):.2f} ({time.time() - t0:.0f}s)",
                  flush=True)
        # early-stop gate on SEPARATE val identities (20000+) so the
        # reported protocol identities (10000+) are never selected on
        if it and it % 500 == 0 and it >= warm:
            vacc, _, _ = _verify(embed, params, state, 20000, 55)
            print(f"[arcface] it {it} val-ids acc {vacc:.4f}", flush=True)
            if vacc >= BAR + 0.02:
                break

    # ---- verification on DISJOINT identities ----
    acc, best_t, n_pos = _verify(embed, params, state, 10000, 123)
    print(f"[arcface] verification acc {acc:.4f} (threshold {best_t:.3f}, "
          f"{n_pos} pos / {n_pos} neg pairs, unseen identities) "
          f"bar {BAR} ({time.time() - t0:.0f}s)")
    steps = it + 1
    import json

    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "accuracy_results.json"), "w") as f:
        json.dump({"metric": "verification_accuracy", "value": acc,
                   "bar": BAR, "steps": steps,
                   "protocol": "disjoint-identity pairs, val-half threshold",
                   "seconds": round(time.time() - t0, 1)}, f, indent=1)
    assert acc >= BAR, (acc, BAR)
    print("PASS")
    return acc


if __name__ == "__main__":
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    ids = int(sys.argv[2]) if len(sys.argv) > 2 else N_TRAIN_IDS
    main(steps=steps, n_train_ids=ids)
