"""Hermetic INSTANCE-SEGMENTATION accuracy validation (mask mAP).

VERDICT r2: the mask outputs of Mask R-CNN and SOLOv2 — the two
flagship instance-seg models — had no quality metric anywhere in the
repo.  This closes the loop: both train from scratch on the procedural
ShapesDetection fixture (now emitting per-instance masks) and are
scored with the native full-protocol evaluator's `iou_type="segm"`
branch (numpy mask IoU — the reference feeds pycocotools RLE instead,
reference tlxcv/tasks/human_pose_estimation.py:253-287).

Measured on one TPU v5e chip (see BENCHMARKS.md for the round's table):
the full train -> predict -> paste -> mask-mAP loop with zero external
data.

Run: python demo/object_detection/accuracy_check_instance_seg.py [maskrcnn|solov2]
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
from tlxcv_tpu.data import ShapesDetection
from tlxcv_tpu.utils.coco_eval import compute_coco_stats

SIZE = 128
M = 4
B = 16
NC = 3

# mask-mAP floors (set ~15% under the measured numbers so regressions
# trip but seed noise does not).  SOLOv2 measured 0.5000 (r3) and
# 0.4991 (r4 re-run after the assigner fixes) — the original 0.50
# floor was set AT the measurement with zero margin, violating the
# stated policy; 0.43 restores the ~15% margin.
FLOORS = {"maskrcnn": {"segm": 0.50, "bbox": 0.60},
          "solov2": {"segm": 0.43}}


def _r18():
    from tlxcv_tpu.models.classification.resnet import ResNet

    return ResNet(depth=18, num_classes=0, with_pool=False)


def batcher(ds, idxs):
    imgs, boxes, labels, vmask, gmasks = [], [], [], [], []
    for i in idxs:
        im, t = ds[int(i)]
        imgs.append(im)
        b = np.zeros((M, 4), np.float32)
        l = np.zeros((M,), np.int64)
        v = np.zeros((M,), np.float32)
        gm = np.zeros((M, SIZE, SIZE), np.float32)
        n = len(t["boxes"])
        b[:n] = t["boxes"][:M]
        l[:n] = t["class_labels"][:M]
        v[:n] = 1
        gm[:n] = t["masks"][:M]
        boxes.append(b)
        labels.append(l)
        vmask.append(v)
        gmasks.append(gm)
    return (jnp.asarray(np.stack(imgs), jnp.float32),
            {"boxes": jnp.asarray(np.stack(boxes)),
             "class_labels": jnp.asarray(np.stack(labels), jnp.int32),
             "mask": jnp.asarray(np.stack(vmask)),
             "masks": jnp.asarray(np.stack(gmasks))})


def _train(model, steps, lr, log_tag, warmup=0):
    """warmup matters for SOLOv2: at full lr from step 0 the dice loss
    drives every mask sigmoid into the all-zero dead zone within ~20
    steps (pred mass -> 0, gradients vanish, dice pinned at ~0.93 —
    measured) while a fixed batch overfits fine; the official SOLOv2
    recipe's 500-iter lr warmup exists for exactly this."""
    params, state = split(model)
    lp = pure(model, lambda m, v, t: m.loss_fn(m(v), t))
    if warmup:
        sched = optax.warmup_cosine_decay_schedule(0.0, lr, warmup, steps)
    else:
        sched = optax.cosine_decay_schedule(lr, steps)
    tx = optax.adam(sched)
    opt_state = tx.init(params)
    train = ShapesDetection(num=4096, size=SIZE, seed=0, return_masks=True)

    @jax.jit
    def step(params, state, opt_state, x, t):
        def lf(p):
            loss, ns = lp(p, state, x, t, training=True)
            return loss, ns

        (loss, state), g = jax.value_and_grad(lf, has_aux=True)(params)
        u, opt_state = tx.update(g, opt_state)
        return optax.apply_updates(params, u), state, opt_state, loss

    rng = np.random.default_rng(0)
    t0 = time.time()
    for it in range(steps):
        x, t = batcher(train, rng.integers(0, len(train), size=B))
        params, state, opt_state, loss = step(params, state, opt_state, x, t)
        if it % 250 == 0:
            print(f"  [{log_tag}] it {it} loss {float(loss):.4f} "
                  f"({time.time() - t0:.0f}s)", flush=True)
    return params, state, t0


def _gather_gts(val, idxs):
    gts = []
    for i in idxs:
        _, t = val[int(i)]
        gts.append({"boxes": t["boxes"], "labels": t["class_labels"],
                    "masks": t["masks"]})
    return gts


def run_maskrcnn(steps=2500):
    from tlxcv_tpu.models.detection import MaskRCNN

    model = MaskRCNN(num_classes=NC, backbone=_r18(), num_proposals=64,
                     pre_nms_top_k=256, detections_per_image=16,
                     box_score_thresh=0.05)
    params, state, t0 = _train(model, steps, 1e-3, "maskrcnn")
    fwd = pure(model)

    @jax.jit
    def predict(params, state, x):
        dets, counts, masks = fwd(params, state, x, training=False)[0]
        pasted = model.paste(masks, dets, counts, (SIZE, SIZE))
        return dets, counts, pasted

    val = ShapesDetection(num=128, size=SIZE, seed=999, return_masks=True)
    preds, gts = [], []
    for i0 in range(0, len(val), B):
        idxs = list(range(i0, min(i0 + B, len(val))))
        x, _ = batcher(val, idxs)
        dets, counts, pasted = predict(params, state, x)
        dets = np.asarray(dets, np.float32)
        counts = np.asarray(counts)
        pasted = np.asarray(pasted, np.float32)
        for j, i in enumerate(idxs):
            n = int(counts[j])
            preds.append({"boxes": dets[j, :n, 2:6],
                          "scores": dets[j, :n, 1],
                          "labels": dets[j, :n, 0].astype(int),
                          "masks": pasted[j, :n] > 0.5})
        gts.extend(_gather_gts(val, idxs))
    segm = compute_coco_stats(preds, gts, iou_type="segm")
    bbox = compute_coco_stats(preds, gts, iou_type="bbox")
    el = time.time() - t0
    print(f"  [maskrcnn] segm mAP={segm['map']:.4f} mAP50={segm['map50']:.4f}"
          f" | bbox mAP={bbox['map']:.4f} ({el:.0f}s)", flush=True)
    return {"model": "maskrcnn", "segm_map": segm["map"],
            "segm_map50": segm["map50"], "bbox_map": bbox["map"],
            "seconds": round(el, 1),
            "pass": (segm["map"] >= FLOORS["maskrcnn"]["segm"]
                     and bbox["map"] >= FLOORS["maskrcnn"]["bbox"])}


def run_solov2(steps=4000):
    from tlxcv_tpu.models.detection import SOLOv2

    model = SOLOv2(num_classes=NC, backbone=_r18(), pre_top_k=64,
                   keep_top_k=16, max_pos=32, score_threshold=0.05)
    params, state, t0 = _train(model, steps, 1e-3, "solov2", warmup=500)
    fwd = pure(model)

    @jax.jit
    def predict(params, state, x):
        cls, scores, masks, counts = fwd(params, state, x, training=False)[0]
        k = masks.shape[1]
        up = jax.image.resize(masks, (masks.shape[0], k, SIZE, SIZE),
                              "bilinear")
        return cls, scores, up, counts

    val = ShapesDetection(num=128, size=SIZE, seed=999, return_masks=True)
    preds, gts = [], []
    for i0 in range(0, len(val), B):
        idxs = list(range(i0, min(i0 + B, len(val))))
        x, _ = batcher(val, idxs)
        cls, scores, masks, counts = predict(params, state, x)
        cls = np.asarray(cls)
        scores = np.asarray(scores, np.float32)
        masks = np.asarray(masks, np.float32)
        counts = np.asarray(counts)
        for j, i in enumerate(idxs):
            n = int(counts[j])
            bin_m = masks[j, :n] > 0.5
            # no boxes: the segm protocol derives detection areas from
            # the masks themselves (coco_eval._prepare_image)
            preds.append({"scores": scores[j, :n],
                          "labels": cls[j, :n].astype(int),
                          "masks": bin_m})
        gts.extend(_gather_gts(val, idxs))
    segm = compute_coco_stats(preds, gts, iou_type="segm")
    el = time.time() - t0
    print(f"  [solov2] segm mAP={segm['map']:.4f} mAP50={segm['map50']:.4f} "
          f"({el:.0f}s)", flush=True)
    return {"model": "solov2", "segm_map": segm["map"],
            "segm_map50": segm["map50"], "seconds": round(el, 1),
            "pass": segm["map"] >= FLOORS["solov2"]["segm"]}


def main(names):
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "instance_seg_results.json")
    results = []
    if os.path.exists(out_path):  # merge per-model runs by name
        with open(out_path) as f:
            results = [r for r in json.load(f) if r["model"] not in names]
    for name in names:
        print(f"== {name} ==", flush=True)
        r = run_maskrcnn() if name == "maskrcnn" else run_solov2()
        results = [x for x in results if x["model"] != name] + [r]
        with open(out_path, "w") as f:
            json.dump(sorted(results, key=lambda x: x["model"]), f, indent=1)
    # re-gate stale (merged) entries against the CURRENT floors, not
    # the pass flag recorded by whichever revision produced them
    def ok(r):
        fl = FLOORS[r["model"]]
        keys = {"segm": "segm_map", "bbox": "bbox_map"}
        return all(r.get(keys[k], -1) >= v for k, v in fl.items())

    bad = [r["model"] for r in results if not ok(r)]
    if bad:
        raise SystemExit(f"below floor: {bad}")


if __name__ == "__main__":
    names = sys.argv[1:] or ["maskrcnn", "solov2"]
    main(names)
