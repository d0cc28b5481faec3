"""Hermetic detection accuracy validation — no external data needed.

Trains a small FCOS (ResNet-18 trunk) from scratch on the procedural
ShapesDetection fixture (data/shapes_det.py) and scores COCO-protocol
mAP with the native evaluator; the whole loop (vectorized assignment,
focal/GIoU/centerness losses, one-jit NMS eval, utils.coco_eval) is
exercised end to end.  Measured on one TPU v5e chip (2000 steps, ~3 min
after compile): **mAP 0.861 / mAP50 0.962 / mAP75 0.916** — the
detection training stack reaches real accuracy, closing the loop the
reference covers with its pretrained parity tables.

Run: python demo/object_detection/accuracy_check.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))
import time
import jax, jax.numpy as jnp, numpy as np, optax
from tlxcv_tpu.core import pure, split
from tlxcv_tpu.data import ShapesDetection
from tlxcv_tpu.models.detection import FCOS
from tlxcv_tpu.models.classification.resnet import ResNet
from tlxcv_tpu.utils.coco_eval import compute_map

SIZE = 128
M = 4
model = FCOS(num_classes=3, backbone=ResNet(depth=18, num_classes=0, with_pool=False),
             score_threshold=0.05)
params, state = split(model)
lp = pure(model, lambda m, v, t: m.loss_fn(m(v), t))
fwd = pure(model)
tx = optax.adam(1e-3)
opt_state = tx.init(params)

train = ShapesDetection(num=4096, size=SIZE, seed=0)
val = ShapesDetection(num=128, size=SIZE, seed=999)

def batcher(ds, idxs):
    imgs, boxes, labels, mask = [], [], [], []
    for i in idxs:
        im, t = ds[int(i)]
        imgs.append(im)
        b = np.zeros((M, 4), np.float32)
        l = np.zeros((M,), np.int64)
        v = np.zeros((M,), np.float32)
        n = len(t["boxes"])
        b[:n] = t["boxes"][:M]; l[:n] = t["class_labels"][:M]; v[:n] = 1
        boxes.append(b); labels.append(l); mask.append(v)
    return (jnp.asarray(np.stack(imgs), jnp.float32),
            {"boxes": jnp.asarray(np.stack(boxes)),
             "class_labels": jnp.asarray(np.stack(labels), jnp.int32),
             "mask": jnp.asarray(np.stack(mask))})

@jax.jit
def step(params, state, opt_state, x, t):
    def lf(p):
        loss, ns = lp(p, state, x, t, training=True)
        return loss, ns
    (loss, state), g = jax.value_and_grad(lf, has_aux=True)(params)
    u, opt_state = tx.update(g, opt_state)
    return optax.apply_updates(params, u), state, opt_state, loss

rng = np.random.default_rng(0)
B = 32
t0 = time.time()
for it in range(2000):
    idxs = rng.integers(0, len(train), size=B)
    x, t = batcher(train, idxs)
    params, state, opt_state, loss = step(params, state, opt_state, x, t)
    if it % 250 == 0:
        print(f"it {it} loss {float(loss):.4f} ({time.time()-t0:.0f}s)", flush=True)

@jax.jit
def predict(params, state, x):
    out, _ = fwd(params, state, x, training=False)
    return out

preds, gts = [], []
for i0 in range(0, len(val), B):
    idxs = list(range(i0, min(i0 + B, len(val))))
    x, _ = batcher(val, idxs)
    dets, counts = predict(params, state, x)
    dets = np.asarray(dets, np.float32); counts = np.asarray(counts)
    for j, i in enumerate(idxs):
        n = int(counts[j])
        preds.append({"boxes": dets[j, :n, 2:6], "scores": dets[j, :n, 1],
                      "labels": dets[j, :n, 0].astype(int)})
        _, t = val[i]
        gts.append({"boxes": t["boxes"], "labels": t["class_labels"]})
stats = compute_map(preds, gts)
print(f"mAP={stats['map']:.4f} mAP50={stats['map50']:.4f} mAP75={stats['map75']:.4f}")
