"""Reference-config DETR quality bar (VERDICT r4 #4).

The reference DETR is a FROZEN-BN ResNet-50 backbone
(/root/reference/tlxcv/models/detection/detr.py:284,:397) — a
pretrained-weights regime: frozen identity-stat BN on a from-scratch
backbone leaves it with no normalization at all (r4 measured mAP .048
with falling loss).  The committed sweep row therefore used a live-BN
r18 — correct rationale, but it left the reference config itself with
no quality proof.

This script supplies the missing pretraining hermetically:

  stage 1  train the repo's own classification ResNet-50 on a
           ShapesDetection-derived task (label = class of the largest
           object) — features + real BN statistics form;
  stage 2  build Detr(backbone_depth=50, freeze_bn=True) — the
           reference's frozen-BN r50 semantics — load the pretrained
           backbone (frozen BN absorbs the learned running stats), and
           run the standard sweep leg (train + fixture-mAP eval).

Writes demo/object_detection/detr_r50_results.json; gated by
tests/test_detection_accuracy_bars.py (floor 0.55).

Run: python demo/object_detection/accuracy_check_detr_r50.py [steps_cls] [steps_det]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

import accuracy_sweep as S
from tlxcv_tpu.core import pure, split
from tlxcv_tpu.core.init import set_seed
from tlxcv_tpu.data import ShapesDetection

NC = S.NC
SIZE = S.SIZE


def pretrain_resnet50(steps=1500, batch=64, lr=1e-3):
    """Stage 1: classification pretraining on the detection fixture's
    image distribution (label = class of the largest object)."""
    from tlxcv_tpu.models.classification.resnet import ResNet

    set_seed(0)
    model = ResNet(depth=50, num_classes=NC)
    params, state = split(model)
    fwd = pure(model)
    tx = optax.adam(optax.cosine_decay_schedule(lr, steps))
    opt_state = tx.init(params)
    ds = ShapesDetection(num=4096, size=SIZE, seed=7)

    def label_of(t):
        b = t["boxes"]
        areas = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
        return int(t["class_labels"][int(np.argmax(areas))])

    def batcher(idxs):
        imgs, ys = [], []
        for i in idxs:
            im, t = ds[int(i)]
            imgs.append(im)
            ys.append(label_of(t))
        return (jnp.asarray(np.stack(imgs), jnp.float32),
                jnp.asarray(np.asarray(ys), jnp.int32))

    @jax.jit
    def step(params, state, opt_state, x, y):
        def lf(p):
            logits, ns = fwd(p, state, x, training=True)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits.astype(jnp.float32), y).mean(), ns

        (loss, state), g = jax.value_and_grad(lf, has_aux=True)(params)
        u, opt_state = tx.update(g, opt_state)
        return optax.apply_updates(params, u), state, opt_state, loss

    rng = np.random.default_rng(0)
    t0 = time.time()
    for it in range(steps):
        x, y = batcher(rng.integers(0, len(ds), size=batch))
        params, state, opt_state, loss = step(params, state, opt_state, x, y)
        if it % 250 == 0:
            print(f"  [cls-r50] it {it} loss {float(loss):.4f} "
                  f"({time.time() - t0:.0f}s)", flush=True)
    # held-out accuracy (sanity: features must actually have formed)
    val = ShapesDetection(num=256, size=SIZE, seed=77)

    @jax.jit
    def logits_fn(params, state, x):
        out, _ = fwd(params, state, x, training=False)
        return out

    correct = total = 0
    for i0 in range(0, len(val), 64):
        idxs = list(range(i0, min(i0 + 64, len(val))))
        imgs, ys = [], []
        for i in idxs:
            im, t = val[int(i)]
            imgs.append(im)
            ys.append(label_of(t))
        x = jnp.asarray(np.stack(imgs), jnp.float32)
        pred = np.argmax(np.asarray(logits_fn(params, state, x)), -1)
        correct += int((pred == np.asarray(ys)).sum())
        total += len(idxs)
    acc = correct / total
    print(f"  [cls-r50] pretrain val acc {acc:.4f} "
          f"({time.time() - t0:.0f}s)", flush=True)
    model.load_state_dict({**params, **state})
    return model, acc


def make_detr_r50(pretrained_sd):
    """Stage-2 builder: reference frozen-BN r50 semantics, backbone
    initialized from the stage-1 classifier (frozen BN absorbs its
    running stats; BN affine loads into the frozen buffers)."""
    from tlxcv_tpu.models.detection import Detr

    set_seed(0)
    model = Detr(num_classes=NC, num_queries=25, enc_layers=4, dec_layers=4,
                 dropout=0.0, backbone_depth=50, freeze_bn=True)
    model.backbone.load_state_dict(pretrained_sd)
    return model


def main(steps_cls=1500, steps_det=4000):
    t0 = time.time()
    cls_model, cls_acc = pretrain_resnet50(steps=steps_cls)
    sd = cls_model.state_dict()
    # drop the classifier head; the detection backbone is headless
    backbone_sd = {k: v for k, v in sd.items() if not k.startswith("fc")}

    # Reference LR semantics: backbone at 0.1x the head LR + grad clip 0.1
    # (reference detr configs lr_backbone=1e-5 vs lr=1e-4, clip_max_norm
    # 0.1).  Measured r5: uniform 2e-4 on the pretrained frozen-BN r50
    # collapses the features (loss flat ~12.6, mAP 0.002) — the frozen
    # stats cannot track Adam-rate activation drift.
    S.REGISTRY["detr_r50"] = (lambda: make_detr_r50(backbone_sd),
                              steps_det, 2e-4, 0.55,
                              {"backbone_lr_mult": 0.1, "clip": 0.1})
    S.TARGET_ADAPTERS["detr_r50"] = S.TARGET_ADAPTERS["detr"]
    S.PREDICT_ADAPTERS["detr_r50"] = S.PREDICT_ADAPTERS["detr"]
    r = S.run_model("detr_r50", steps=steps_det)
    r["pretrain_val_acc"] = round(cls_acc, 4)
    r["pretrain_steps"] = steps_cls
    r["total_seconds"] = round(time.time() - t0, 1)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "detr_r50_results.json")
    with open(out, "w") as f:
        json.dump(r, f, indent=1)
    print(json.dumps(r), flush=True)
    if not r["pass"]:
        raise SystemExit("detr_r50 below floor")


if __name__ == "__main__":
    a = sys.argv[1:]
    # 12k detection steps is the measured passing recipe (r5: 8k -> mAP
    # 0.525 still falling; 12k -> 0.5514 >= the 0.55 floor).
    main(steps_cls=int(a[0]) if a else 1500,
         steps_det=int(a[1]) if len(a) > 1 else 12000)
