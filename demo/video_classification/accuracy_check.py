"""Hermetic video-classification accuracy validation — no external data.

Procedural *motion* fixture: each clip shows one shape (random type,
size, color, start position) translating in one of four directions on
a noisy background; the class is the DIRECTION, so any single frame is
class-ambiguous by construction and the model must integrate time —
exactly what I3D's inflated 3D convolutions are for (reference
tlxcv/models/video_classification/i3d.py, Charades demo).

Trains InceptionI3d from scratch through the VideoClassification task
loss (per-frame BCE, reference tasks/video_classification.py:11-13) and
scores clip accuracy with the task's argmax predict on held-out clips.

Bar: accuracy >= 0.90 on 128 held-out clips.

Run: python demo/video_classification/accuracy_check.py
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
from tlxcv_tpu.models.video_classification import InceptionI3d
from tlxcv_tpu.tasks.video_classification import VideoClassification

SIZE = 64
FRAMES = 16
NC = 4
BAR = 0.90
DIRS = np.asarray([[0, -1], [0, 1], [-1, 0], [1, 0]], np.float32)  # dy,dx


def clip(rng):
    """One (frames, H, W, 3) clip + direction label."""
    label = int(rng.integers(0, NC))
    frames = np.asarray(rng.uniform(0, 0.25, size=(FRAMES, SIZE, SIZE, 3)),
                        np.float32)
    r = float(rng.uniform(5, 11))
    speed = float(rng.uniform(1.2, 2.6))
    # uniform start + toroidal wrap-around motion: the first-frame
    # position carries ZERO class information (a trajectory-centered
    # start would leak the direction into frame 1 — caught by
    # tests/test_accuracy_fixtures.py::test_single_frame_is_class_ambiguous)
    cy, cx = rng.uniform(0, SIZE, size=2)
    color = rng.uniform(0.6, 1.0, size=3).astype(np.float32)
    kind = int(rng.integers(0, 2))
    yy, xx = np.mgrid[0:SIZE, 0:SIZE].astype(np.float32)
    for t in range(FRAMES):
        y = (cy + DIRS[label][0] * speed * t) % SIZE
        x = (cx + DIRS[label][1] * speed * t) % SIZE
        # minimum-image (wrapped) offsets
        oy = (yy - y + SIZE / 2) % SIZE - SIZE / 2
        ox = (xx - x + SIZE / 2) % SIZE - SIZE / 2
        if kind == 0:
            m = (oy ** 2 + ox ** 2) <= r * r
        else:
            m = (np.abs(oy) <= r) & (np.abs(ox) <= r)
        frames[t][m] = color
    return frames, label


def batch(rng, n):
    clips, labels = zip(*(clip(rng) for _ in range(n)))
    return jnp.asarray(np.stack(clips)), np.asarray(labels)


def main(steps=400, batch_size=16):
    task = VideoClassification(
        backbone=InceptionI3d(num_classes=NC, in_channels=3))
    params, state = split(task)
    fwd = pure(task)
    pred = pure(task, "predict")
    sched = optax.cosine_decay_schedule(3e-4, steps)
    tx = optax.adam(sched)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, state, opt_state, x, onehot, key):
        def lf(p):
            # task loss: per-frame BCE against the clip one-hot
            # broadcast across T' (reference Charades convention)
            logits, ns = fwd(p, state, x, training=True, rngs=key)
            tgt = jnp.broadcast_to(onehot[:, None, :], logits.shape)
            return task.loss_fn(logits, tgt).mean(), ns

        (loss, state), g = jax.value_and_grad(lf, has_aux=True)(params)
        u, opt_state = tx.update(g, opt_state)
        return optax.apply_updates(params, u), state, opt_state, loss

    rng = np.random.default_rng(0)
    key = jax.random.key(0)
    t0 = time.time()
    for it in range(steps):
        x, y = batch(rng, batch_size)
        onehot = jnp.asarray(np.eye(NC, dtype=np.float32)[y])
        key, sub = jax.random.split(key)
        params, state, opt_state, loss = step(params, state, opt_state, x,
                                              onehot, sub)
        if it % 50 == 0:
            print(f"[i3d] it {it} loss {float(loss):.4f} "
                  f"({time.time() - t0:.0f}s)", flush=True)

    # held-out eval: clip label = majority over per-frame argmax
    predict = jax.jit(lambda p, s, x: pred(p, s, x, training=False)[0])
    eval_rng = np.random.default_rng(999)
    correct = total = 0
    for _ in range(8):                     # 8 x 16 = the documented 128
        x, y = batch(eval_rng, 16)
        per_frame = np.asarray(predict(params, state, x))  # [B, T']
        votes = [np.bincount(f, minlength=NC).argmax() for f in per_frame]
        correct += int(np.sum(np.asarray(votes) == y))
        total += len(y)
    acc = correct / total
    print(f"[i3d] held-out clip accuracy {acc:.4f} ({total} clips) "
          f"bar {BAR} ({time.time() - t0:.0f}s)")
    import json

    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "accuracy_results.json"), "w") as f:
        json.dump({"metric": "clip_accuracy", "value": acc, "bar": BAR,
                   "steps": steps, "clips": total,
                   "seconds": round(time.time() - t0, 1)}, f, indent=1)
    assert acc >= BAR, (acc, BAR)
    print("PASS")
    return acc


if __name__ == "__main__":
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    main(steps=steps)
