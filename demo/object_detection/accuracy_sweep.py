"""Registry-driven hermetic accuracy sweep over the detection zoo.

VERDICT r2: "16 detectors compile and their losses decrease" is not
"16 detectors work" — the head-init saturation pathology was invisible
to loss-decrease tests and only caught by a real train->predict->mAP
loop.  This sweep extends demo/object_detection/accuracy_check.py
(FCOS, mAP 0.861) to the whole one-stage zoo: each model trains from
scratch on the procedural ShapesDetection fixture and must clear a
per-model COCO-mAP floor through the native full-protocol evaluator.

The reference claims all of these complete with 0.0 error in its README
table (reference README.md:112-126) but ships no loop to reproduce it;
this is the zero-external-data equivalent.

Run: python demo/object_detection/accuracy_sweep.py [model ...]
  (no args = all).  Writes per-model results to sweep_results.json as
  each model finishes.  ~3-6 min/model on one TPU v5e chip.

  --int8: after the float bar, push the TRAINED checkpoint through
  ops.quant.quantize_for_serving and re-score it — the quantized model
  must hold mAP within 0.02 of float (VERDICT r4 #5: int8 serving
  proven on a task metric, not just output-drift parity).  Writes to
  int8_results.json.
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

from tlxcv_tpu.core import Module, pure, split
from tlxcv_tpu.data import ShapesDetection
from tlxcv_tpu.utils.coco_eval import compute_map

SIZE = 128
M = 4           # max objects per image
B = 32
NC = 3


def _r18():
    from tlxcv_tpu.models.classification.resnet import ResNet

    return ResNet(depth=18, num_classes=0, with_pool=False)


class _R18C345(Module):
    """ResNet-18 adapter exposing (C3, C4, C5) — TTFNet backbone contract."""

    def __init__(self):
        self.net = _r18()
        self.out_channels = tuple(self.net.feat_channels[1:])

    def __call__(self, x):
        return tuple(self.net.features(x)[1:])


def _fcos():
    from tlxcv_tpu.models.detection import FCOS

    return FCOS(num_classes=NC, backbone=_r18(), score_threshold=0.05)


def _retinanet():
    from tlxcv_tpu.models.detection import RetinaNet

    return RetinaNet(num_classes=NC, backbone=_r18(), score_threshold=0.05)


def _gfl():
    from tlxcv_tpu.models.detection import GFL

    return GFL(num_classes=NC, backbone=_r18(), score_threshold=0.05)


def _tood():
    from tlxcv_tpu.models.detection import TOOD

    return TOOD(num_classes=NC, backbone=_r18(), score_threshold=0.05)


def _yolox():
    from tlxcv_tpu.models.detection import yolox

    return yolox("yolox_s", num_classes=NC, score_threshold=0.05)


def _picodet():
    from tlxcv_tpu.models.detection import PicoDet

    return PicoDet(num_classes=NC, scale=0.75, score_threshold=0.05)


def _ppyoloe_s():
    from tlxcv_tpu.models.detection import ppyoloe

    return ppyoloe("ppyoloe_s", num_classes=NC,
                   nms_cfg=dict(score_threshold=0.05, nms_threshold=0.6,
                                nms_top_k=1000, keep_top_k=100))


def _centernet():
    from tlxcv_tpu.models.detection import CenterNet

    return CenterNet(num_classes=NC, backbone=_r18(), score_threshold=0.05)


def _ttfnet():
    from tlxcv_tpu.models.detection import TTFNet

    return TTFNet(num_classes=NC, backbone=_R18C345(), score_threshold=0.05)


def _ssd(size=SIZE):
    from tlxcv_tpu.models.detection import SSD

    return SSD(num_classes=NC, image_size=(size, size),
               score_threshold=0.05, nms_threshold=0.5)


def _yolov3():
    from tlxcv_tpu.models.detection import YOLOv3

    # fixture-scaled anchors: objects are 19-51 px at SIZE=128
    # (shapes_det.py draws w,h ~ U[0.15, 0.4]*size); the COCO defaults
    # (10..373 px for 416-608 inputs) leave the 32-stride level with no
    # matchable anchor here.  Masks keep the convention
    # (6,7,8)->stride 32 = largest.
    anchors = ((14, 14), (20, 26), (26, 20),
               (28, 28), (36, 28), (28, 36),
               (40, 40), (48, 48), (52, 40))
    return YOLOv3(num_classes=NC, anchors=anchors, score_threshold=0.05)


def _faster_rcnn():
    from tlxcv_tpu.models.detection import faster_rcnn

    return faster_rcnn(num_classes=NC, backbone=_r18(),
                       box_score_thresh=0.05)


def _cascade_rcnn():
    from tlxcv_tpu.models.detection import CascadeRCNN

    return CascadeRCNN(num_classes=NC, backbone=_r18(),
                       box_score_thresh=0.05)


def _detr():
    from tlxcv_tpu.models.detection import Detr

    # 4 decoder/encoder layers and 25 queries are plenty for <=4 objects
    # at 128^2 (16 encoder tokens); full DETR depth just slows the bar.
    # freeze_bn=False + resnet18: frozen identity-BN is the PRETRAINED
    # regime — from scratch it leaves the backbone unnormalized (r4:
    # mAP .048 with falling loss, features never formed).
    return Detr(num_classes=NC, num_queries=25, enc_layers=4, dec_layers=4,
                dropout=0.0, backbone_depth=18, freeze_bn=False)


def _detr_predict(model, x):
    """DETR eval returns {logits, boxes}; adapt to (dets, counts)."""
    out = model(x)
    labels, scores, boxes = model.predict_boxes(out, x.shape[1:3])
    order = jnp.argsort(-scores, axis=1)
    take = lambda a: jnp.take_along_axis(a, order[..., None] if a.ndim == 3
                                         else order, axis=1)
    labels, scores, boxes = take(labels), take(scores), take(boxes)
    dets = jnp.concatenate([labels[..., None].astype(jnp.float32),
                            scores[..., None], boxes], -1)
    return dets, jnp.sum(scores > 0.05, axis=1)


def _tgt_norm_xyxy(t, size=SIZE):
    """SSD contract: boxes normalized xyxy (ssd.py loss_fn)."""
    return {**t, "boxes": t["boxes"] / size}


def _tgt_norm_cxcywh(t, size=SIZE):
    """YOLOv3 contract: boxes normalized cxcywh, padded rows w=h=0."""
    b = t["boxes"] / size
    cxcy = (b[..., :2] + b[..., 2:]) / 2
    wh = (b[..., 2:] - b[..., :2]) * t["mask"][..., None]
    return {**t, "boxes": jnp.concatenate([cxcy, wh], -1),
            "scores": t["mask"]}


# name -> (builder, steps, lr, mAP floor).  Floors are set ~10-15% under
# the measured sweep numbers (table in BENCHMARKS.md) so real
# regressions trip them but seed-level noise does not.
REGISTRY = {
    "fcos": (_fcos, 2000, 1e-3, 0.75),
    "retinanet": (_retinanet, 2000, 1e-3, 0.60),
    "gfl": (_gfl, 2000, 1e-3, 0.75),
    "tood": (_tood, 2000, 1e-3, 0.70),
    "yolox_s": (_yolox, 2000, 1e-3, 0.70),
    "picodet": (_picodet, 3000, 2e-3, 0.60),
    # reference schedule: static-ATSS warmup then TaskAligned (the r3
    # ATSS-only runs measured .712 pre-conflict-fix / .512 post-fix;
    # two-phase restores the reference's intended training dynamics)
    "ppyoloe_s": (_ppyoloe_s, 2500, 1e-3, 0.62, {"tal_after": 700}),
    "centernet": (_centernet, 3000, 1e-3, 0.55),
    "ttfnet": (_ttfnet, 3000, 1e-3, 0.55),
    # SSD runs at 256^2: at 128^2 its stride-16-and-up pyramid leaves
    # fixture objects ~2 matched priors per IMAGE (best-prior IoU p10
    # 0.42 — the 16 px grid offset alone), vs 10.6 matches and p10 0.58
    # at 256^2, which reproduces the reference config's geometry
    # (objects >= 0.2 x input at stride 16).  Measured r4: 0.23 mAP at
    # 128^2 regardless of ladder; see run_model size option.
    "ssd": (_ssd, 5000, 1e-3, 0.50, {"size": 256, "batch": 16}),
    # darknet53 from scratch converges slowest in the zoo: loss was
    # still dropping 40%/500-steps at the 3000 cutoff (r4: mAP .515)
    "yolov3": (_yolov3, 8000, 1e-3, 0.60),
    "faster_rcnn": (_faster_rcnn, 2000, 1e-3, 0.55),
    # 3 cascade stages at b32 need 20 GB HBM (>15.75 available, r4 OOM):
    # halve the train batch, double the steps — same sample budget
    "cascade_rcnn": (_cascade_rcnn, 4000, 1e-3, 0.55, {"batch": 16}),
    "detr": (_detr, 4000, 2e-4, 0.30),
}

# models whose loss_fn speaks a different box convention than the
# sweep's canonical pixel-xyxy targets
TARGET_ADAPTERS = {
    "ssd": _tgt_norm_xyxy,
    "yolov3": _tgt_norm_cxcywh,
    "detr": _tgt_norm_cxcywh,
}

# models whose eval __call__ does not already return (dets, counts)
PREDICT_ADAPTERS = {
    "detr": _detr_predict,
}


def batcher(ds, idxs):
    imgs, boxes, labels, mask = [], [], [], []
    for i in idxs:
        im, t = ds[int(i)]
        imgs.append(im)
        b = np.zeros((M, 4), np.float32)
        l = np.zeros((M,), np.int64)
        v = np.zeros((M,), np.float32)
        n = len(t["boxes"])
        b[:n] = t["boxes"][:M]
        l[:n] = t["class_labels"][:M]
        v[:n] = 1
        boxes.append(b)
        labels.append(l)
        mask.append(v)
    return (jnp.asarray(np.stack(imgs), jnp.float32),
            {"boxes": jnp.asarray(np.stack(boxes)),
             "class_labels": jnp.asarray(np.stack(labels), jnp.int32),
             "mask": jnp.asarray(np.stack(mask))})


def run_model(name, steps=None, log_every=500, int8=False):
    entry = REGISTRY[name]
    build, default_steps, lr, floor = entry[:4]
    opts = entry[4] if len(entry) > 4 else {}
    train_b = opts.get("batch", B)
    # per-model input size: SSD's stride-16-and-up pyramid needs the
    # fixture objects in its geometric sweet spot (reference config:
    # objects >= 0.2 of a 300^2 input at stride 16; at 128^2 the grid
    # offset alone caps best-prior IoU near the 0.5 match threshold)
    sz = opts.get("size", SIZE)
    raw_adapt = TARGET_ADAPTERS.get(name)
    adapt = (lambda t: raw_adapt(t, sz)) if raw_adapt else (lambda t: t)
    steps = steps or default_steps
    # weight init draws from core.init's GLOBAL host RNG (CLAUDE.md):
    # without a per-model reset, each model's init depends on which
    # models ran before it, making CLI-subset runs irreproducible
    from tlxcv_tpu.core.init import set_seed

    set_seed(0)
    import inspect

    model = build(size=sz) if "size" in inspect.signature(build).parameters \
        else build()
    params, state = split(model)
    # PPYOLOE-style two-phase assignment: the reference trains a STATIC
    # (ATSS) warmup for `static_assigner_epoch` epochs, then switches to
    # the TaskAligned assigner (`epoch_id` is a static Python branch in
    # get_loss — one recompile at the switch).  Training ATSS-only for
    # the whole run is NOT the reference schedule (r4: it plateaued the
    # fixture at mAP .51 with half the instances unlearned).
    tal_after = opts.get("tal_after")
    if tal_after is not None:
        lps = [pure(model, lambda m, v, t: m.loss_fn(m(v, epoch_id=0), t)),
               pure(model, lambda m, v, t: m.loss_fn(
                   m(v, epoch_id=10 ** 6), t))]
    else:
        lps = [pure(model, lambda m, v, t: m.loss_fn(m(v), t))]
    fwd = pure(model, PREDICT_ADAPTERS[name]) if name in PREDICT_ADAPTERS \
        else pure(model)
    sched = optax.cosine_decay_schedule(lr, steps)
    # Reference DETR recipe semantics (reference tlxcv/demo/object_detection
    # configs: lr_backbone = 0.1x lr, clip_max_norm 0.1): a PRETRAINED
    # frozen-BN backbone fine-tuned at the full head LR collapses — Adam at
    # 2e-4 shifts the conv activations away from the frozen running stats
    # within a few hundred steps and the features can never re-normalize
    # (measured: detr_r50 loss flat at ~12.6 from step 500, mAP 0.002).
    bb_mult = opts.get("backbone_lr_mult")
    clip = opts.get("clip")
    if bb_mult is not None:
        bb_sched = optax.cosine_decay_schedule(lr * bb_mult, steps)
        labels = {k: ("backbone" if k.startswith("backbone") else "main")
                  for k in params}
        tx = optax.multi_transform(
            {"backbone": optax.adam(bb_sched), "main": optax.adam(sched)},
            labels)
    else:
        tx = optax.adam(sched)
    if clip is not None:
        tx = optax.chain(optax.clip_by_global_norm(clip), tx)
    opt_state = tx.init(params)

    train = ShapesDetection(num=4096, size=sz, seed=0)
    val = ShapesDetection(num=128, size=sz, seed=999)

    def make_step(lp):
        @jax.jit
        def step(params, state, opt_state, x, t):
            t = adapt(t)
            def lf(p):
                loss, ns = lp(p, state, x, t, training=True)
                return loss, ns

            (loss, state), g = jax.value_and_grad(lf, has_aux=True)(params)
            u, opt_state = tx.update(g, opt_state)
            return optax.apply_updates(params, u), state, opt_state, loss
        return step

    steps_fns = [make_step(lp) for lp in lps]

    rng = np.random.default_rng(0)
    t0 = time.time()
    for it in range(steps):
        step = steps_fns[-1] if (tal_after is not None and it >= tal_after) \
            else steps_fns[0]
        x, t = batcher(train, rng.integers(0, len(train), size=train_b))
        params, state, opt_state, loss = step(params, state, opt_state, x, t)
        if it % log_every == 0:
            print(f"  [{name}] it {it} loss {float(loss):.4f} "
                  f"({time.time() - t0:.0f}s)", flush=True)

    @jax.jit
    def predict(params, state, x):
        out, _ = fwd(params, state, x, training=False)
        return out

    def eval_map(predict_fn, p, s):
        preds, gts = [], []
        for i0 in range(0, len(val), B):
            idxs = list(range(i0, min(i0 + B, len(val))))
            x, _ = batcher(val, idxs)
            out = predict_fn(p, s, x)
            dets = np.asarray(out[0], np.float32)
            counts = np.asarray(out[1])
            for j, i in enumerate(idxs):
                n = int(counts[j])
                preds.append({"boxes": dets[j, :n, 2:6],
                              "scores": dets[j, :n, 1],
                              "labels": dets[j, :n, 0].astype(int)})
                _, t = val[i]
                gts.append({"boxes": t["boxes"],
                            "labels": t["class_labels"]})
        return compute_map(preds, gts)

    stats = eval_map(predict, params, state)
    elapsed = time.time() - t0
    print(f"  [{name}] mAP={stats['map']:.4f} mAP50={stats['map50']:.4f} "
          f"mAP75={stats['map75']:.4f} floor={floor} ({elapsed:.0f}s)",
          flush=True)
    result = {"model": name, "map": stats["map"], "map50": stats["map50"],
              "map75": stats["map75"], "floor": floor, "steps": steps,
              "seconds": round(elapsed, 1), "pass": stats["map"] >= floor}

    if int8:
        # int8 TASK-accuracy bar (VERDICT r4 #5): the serving claim so
        # far rested on detection-count/box-drift parity on random
        # inputs (tests/test_quant.py); here the TRAINED checkpoint goes
        # through the full quantize_for_serving pipeline and must hold
        # the fixture mAP within 0.02 of its float self.
        from tlxcv_tpu.ops.quant import quantize_for_serving

        model.load_state_dict({**params, **state})
        calib = [np.asarray(batcher(train, rng.integers(
            0, len(train), size=8))[0], np.float32) for _ in range(2)]
        # fold/fuse verification needs a single-array eval-mode forward;
        # detectors emit multi-level heads — flatten-and-concat them
        fold_fwd = (lambda v: jnp.concatenate(
            [o.reshape(-1) for o in
             jax.tree_util.tree_leaves(model.head_outputs(jnp.asarray(v)))]))
        n_fold, n_q, n_cal, n_fuse = quantize_for_serving(
            model, calib, forward=fold_fwd)
        print(f"  [{name}] int8: folded {n_fold} BN, {n_q} layers, "
              f"{n_cal} calibrated, {n_fuse} requant-fused", flush=True)
        qparams, qstate = split(model)
        qfwd = pure(model, PREDICT_ADAPTERS[name]) \
            if name in PREDICT_ADAPTERS else pure(model)

        @jax.jit
        def predict_q(p, s, x):
            out, _ = qfwd(p, s, x, training=False)
            return out

        qstats = eval_map(predict_q, qparams, qstate)
        drop = stats["map"] - qstats["map"]
        print(f"  [{name}] int8 mAP={qstats['map']:.4f} "
              f"(float {stats['map']:.4f}, drop {drop:+.4f})", flush=True)
        result.update(int8_map=qstats["map"], int8_map50=qstats["map50"],
                      int8_drop=round(drop, 4),
                      int8_pass=qstats["map"] >= stats["map"] - 0.02)
        result["pass"] = result["pass"] and result["int8_pass"]
    return result


def main(names, int8=False, steps=None):
    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "int8_results.json" if int8 else "sweep_results.json")
    results = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            results = {r["model"]: r for r in json.load(f)}
    failed = []
    for name in names:
        print(f"== {name} ==", flush=True)
        try:
            r = run_model(name, steps=steps, int8=int8)
        except Exception as e:  # keep sweeping; report at the end
            print(f"  [{name}] ERROR: {e}", flush=True)
            r = {"model": name, "error": str(e), "pass": False}
        results[name] = r
        with open(out_path, "w") as f:
            json.dump(list(results.values()), f, indent=1)
        if not r["pass"]:
            failed.append(name)
    print("\n== sweep summary ==")
    for name in names:
        r = results[name]
        if "map" in r:
            mark = "PASS" if r["pass"] else "FAIL"
            print(f"  {name:12s} mAP {r['map']:.4f} (floor {r['floor']}) "
                  f"{mark}")
        else:
            print(f"  {name:12s} ERROR {r.get('error', '?')}")
    if failed:
        raise SystemExit(f"models below floor: {failed}")


if __name__ == "__main__":
    argv = sys.argv[1:]
    int8 = "--int8" in argv
    steps = None
    names = []
    for a in argv:
        if a == "--int8":
            continue
        elif a.startswith("--steps="):
            steps = int(a.split("=", 1)[1])
        else:
            names.append(a)
    names = names or list(REGISTRY)
    bad = [n for n in names if n not in REGISTRY]
    if bad:
        raise SystemExit(f"unknown models {bad}; known: {list(REGISTRY)}")
    main(names, int8=int8, steps=steps)
