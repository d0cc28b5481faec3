"""Hermetic pose accuracy validation — no external data needed.

Procedural keypoint fixture: each of 5 "joints" is a small disk with a
fixed distinct color at a random position; the exact centers are the
GT keypoints.  Trains PoseHighResolutionNet (HRNet-W18-small trunk)
from scratch with the on-device gaussian heatmap targets and scores
PCK@0.05 with the task metric — the full train -> heatmap-decode ->
PCK loop end to end (the analog of the detection
demo/object_detection/accuracy_check.py; the reference validates pose
only through pretrained COCO weights).

Measured on one TPU v5e chip (800 steps, ~2 min after compile):
**PCK@0.05 = 1.000** (all disks localized within 5% of image size).

Run: python demo/human_pose_estimation/accuracy_check.py
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
from tlxcv_tpu.models.backbones.hrnet import hrnet_w18_small_v1
from tlxcv_tpu.models.human_pose_estimation.hrnet import \
    PoseHighResolutionNet
from tlxcv_tpu.tasks.human_pose_estimation import (PCK,
                                                   generate_heatmap_target)

SIZE = 128
J = 5
COLORS = np.asarray([[1.0, 0.2, 0.2], [0.2, 1.0, 0.2], [0.2, 0.2, 1.0],
                     [1.0, 1.0, 0.2], [0.2, 1.0, 1.0]], np.float32)


def sample(rng, n):
    imgs = np.asarray(
        rng.uniform(0, 0.3, size=(n, SIZE, SIZE, 3)), np.float32)
    kps = np.zeros((n, J, 3), np.float32)
    yy, xx = np.mgrid[0:SIZE, 0:SIZE].astype(np.float32)
    for i in range(n):
        for j in range(J):
            cx = rng.uniform(8, SIZE - 8)
            cy = rng.uniform(8, SIZE - 8)
            r = rng.uniform(3, 5)
            m = (xx - cx) ** 2 + (yy - cy) ** 2 <= r ** 2
            imgs[i][m] = COLORS[j]
            kps[i, j] = (cx, cy, 1.0)
    return imgs, kps


def main():
    model = PoseHighResolutionNet(num_joints=J,
                                  backbone=hrnet_w18_small_v1())
    params, state = split(model)
    lp = pure(model, lambda m, x, t, w: m.loss_fn(m(x), (t, w)))
    fwd = pure(model)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, state, opt_state, x, kps):
        tgt, wgt = generate_heatmap_target(
            kps, input_size=(SIZE, SIZE), heatmap_size=(SIZE // 4, SIZE // 4))

        def lf(p):
            loss, ns = lp(p, state, x, tgt, wgt, training=True)
            return loss, ns

        (loss, state), g = jax.value_and_grad(lf, has_aux=True)(params)
        u, opt_state = tx.update(g, opt_state)
        return optax.apply_updates(params, u), state, opt_state, loss

    rng = np.random.default_rng(0)
    t0 = time.time()
    for it in range(800):
        x, kps = sample(rng, 16)
        params, state, opt_state, loss = step(
            params, state, opt_state, jnp.asarray(x), jnp.asarray(kps))
        if it % 200 == 0:
            print(f"it {it} loss {float(loss):.5f} ({time.time()-t0:.0f}s)",
                  flush=True)

    @jax.jit
    def predict(params, state, x):
        out, _ = fwd(params, state, x, training=False)
        return out

    pck = PCK(threshold=0.05)
    vrng = np.random.default_rng(12345)
    for _ in range(4):
        x, kps = sample(vrng, 16)
        hm = predict(params, state, jnp.asarray(x))
        tgt, _ = generate_heatmap_target(
            jnp.asarray(kps), input_size=(SIZE, SIZE),
            heatmap_size=(SIZE // 4, SIZE // 4))
        pck.update(np.asarray(hm, np.float32), np.asarray(tgt, np.float32))
    print(f"PCK@0.05 = {pck.result():.4f}")


if __name__ == "__main__":
    main()
