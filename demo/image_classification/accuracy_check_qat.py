"""QAT -> int8-serving accuracy bar on a real model family (VERDICT r4
#3 done-criterion: not just the MLP fixture in tests/test_qat.py — a
ViT QAT bar whose converted int8 model is scored on the task metric).

Hermetic task: classify the largest object's class in ShapesDetection
images (same fixture family as the detection sweep), micro-ViT (64^2,
patch 8, dim 128, depth 4).  Pipeline:

  1. float training -> float_acc;
  2. PTQ (quantize_weights + calibrate_activations, full-int8 Linears)
     -> ptq_acc (context: how lossy naive post-training int8 is here);
  3. QAT: reload float weights, enable_qat(act=True), same calibration,
     fine-tune under fake-quant, qat_serving_convert -> int8 scored on
     the task -> qat_int8_acc.

Bar (gated in tests/test_accuracy_result_gates.py):
qat_int8_acc >= float_acc - 0.02 AND qat_int8_acc >= ptq_acc - 0.005
(QAT must deliver a servable int8 model at float accuracy; it must
never be WORSE than skipping QAT).

Run: python demo/image_classification/accuracy_check_qat.py [steps] [qat_steps]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tlxcv_tpu.core import pure, split
from tlxcv_tpu.core.init import set_seed
from tlxcv_tpu.data import ShapesDetection
from tlxcv_tpu.models.classification.vision_transformer import (
    VisionTransformer)
from tlxcv_tpu.ops.quant import (calibrate_activations, enable_qat,
                                 qat_serving_convert, quantize_weights)

SIZE = 64
NC = 3
BATCH = 64


def build_vit():
    set_seed(0)
    return VisionTransformer(img_size=SIZE, patch_size=8, num_classes=NC,
                             embed_dim=128, depth=4, num_heads=4,
                             mlp_ratio=2.0, qkv_bias=True)


def make_data():
    train = ShapesDetection(num=4096, size=SIZE, seed=11)
    val = ShapesDetection(num=512, size=SIZE, seed=99)

    def label_of(t):
        b = t["boxes"]
        areas = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
        return int(t["class_labels"][int(np.argmax(areas))])

    def as_xy(ds, idxs):
        imgs, ys = [], []
        for i in idxs:
            im, t = ds[int(i)]
            imgs.append(im)
            ys.append(label_of(t))
        return (np.stack(imgs).astype(np.float32),
                np.asarray(ys, np.int32))

    Xv, Yv = as_xy(val, range(len(val)))
    return train, as_xy, Xv, Yv


def finetune(model, train, as_xy, steps, lr):
    params, state = split(model)
    fwd = pure(model)
    tx = optax.adam(optax.cosine_decay_schedule(lr, steps))
    opt = tx.init(params)

    @jax.jit
    def step(p, s, o, x, y):
        def lf(p):
            logits, ns = fwd(p, s, x, training=True)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits.astype(jnp.float32), y).mean(), ns

        (loss, s), g = jax.value_and_grad(lf, has_aux=True)(p)
        u, o = tx.update(g, o)
        return optax.apply_updates(p, u), s, o, loss

    rng = np.random.default_rng(0)
    t0 = time.time()
    for it in range(steps):
        X, Y = as_xy(train, rng.integers(0, len(train), size=BATCH))
        params, state, opt, loss = step(params, state, opt,
                                        jnp.asarray(X), jnp.asarray(Y))
        if it % 250 == 0:
            print(f"  it {it} loss {float(loss):.4f} "
                  f"({time.time() - t0:.0f}s)", flush=True)
    model.load_state_dict({**params, **state})


def accuracy(model, Xv, Yv):
    params, state = split(model)
    fwd = pure(model)

    @jax.jit
    def logits_fn(p, s, x):
        out, _ = fwd(p, s, x, training=False)
        return out

    correct = 0
    for i0 in range(0, len(Xv), 128):
        x = jnp.asarray(Xv[i0:i0 + 128])
        pred = np.argmax(np.asarray(logits_fn(params, state, x)), -1)
        correct += int((pred == Yv[i0:i0 + 128]).sum())
    return correct / len(Xv)


def main(steps=1500, qat_steps=600):
    t0 = time.time()
    train, as_xy, Xv, Yv = make_data()
    model = build_vit()
    finetune(model, train, as_xy, steps, 1e-3)
    float_acc = accuracy(model, Xv, Yv)
    print(f"float acc {float_acc:.4f}", flush=True)
    sd = model.state_dict()
    calib = [as_xy(train, range(i * 32, (i + 1) * 32))[0] for i in range(2)]

    m_ptq = build_vit()
    m_ptq.load_state_dict(sd)
    quantize_weights(m_ptq)
    calibrate_activations(m_ptq, calib)
    ptq_acc = accuracy(m_ptq, Xv, Yv)
    print(f"ptq acc {ptq_acc:.4f}", flush=True)

    m_qat = build_vit()
    m_qat.load_state_dict(sd)
    n = enable_qat(m_qat, act=True)
    calibrate_activations(m_qat, calib)
    finetune(m_qat, train, as_xy, qat_steps, 2e-4)
    qat_serving_convert(m_qat)
    qat_int8_acc = accuracy(m_qat, Xv, Yv)
    print(f"qat-int8 acc {qat_int8_acc:.4f} ({n} layers)", flush=True)

    r = {
        "metric": "vit_qat_int8",
        "model": f"micro-ViT {SIZE}^2/p8 d128x4",
        "float_acc": round(float_acc, 4),
        "ptq_acc": round(ptq_acc, 4),
        "qat_int8_acc": round(qat_int8_acc, 4),
        "bar": round(float_acc - 0.02, 4),
        "steps": steps, "qat_steps": qat_steps,
        "seconds": round(time.time() - t0, 1),
        "pass": (qat_int8_acc >= float_acc - 0.02
                 and qat_int8_acc >= ptq_acc - 0.005),
    }
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "accuracy_results_qat.json")
    with open(out, "w") as f:
        json.dump(r, f, indent=1)
    print(json.dumps(r), flush=True)
    if not r["pass"]:
        raise SystemExit("QAT int8 bar failed")


if __name__ == "__main__":
    a = sys.argv[1:]
    main(steps=int(a[0]) if a else 1500,
         qat_steps=int(a[1]) if len(a) > 1 else 600)
