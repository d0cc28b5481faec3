"""Detection training actually learns: tiny YOLOv3 on a fixed synthetic
batch — total loss must decrease substantially."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from tlxcv_tpu.core import Rngs, pure, split
from tlxcv_tpu.models.detection import YOLOv3


def test_yolov3_loss_decreases(rng):
    model = YOLOv3(num_classes=3)
    params, state = split(model)
    x = jnp.asarray(rng.normal(size=(2, 96, 96, 3)), jnp.float32)
    boxes = np.zeros((2, 4, 4), np.float32)
    boxes[:, :2, 0:2] = rng.uniform(0.3, 0.7, size=(2, 2, 2))
    boxes[:, :2, 2:4] = rng.uniform(0.2, 0.5, size=(2, 2, 2))
    targets = {"boxes": jnp.asarray(boxes),
               "class_labels": jnp.asarray(
                   rng.integers(0, 3, size=(2, 4)), jnp.int32)}

    lp = pure(model, lambda m, x, t: m.loss_fn(m(x), t))
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, state, opt_state):
        def lf(p):
            loss, ns = lp(p, state, x, targets, training=True,
                          rngs=Rngs(jax.random.key(0)))
            return loss, ns
        (loss, state), g = jax.value_and_grad(lf, has_aux=True)(params)
        u, opt_state = tx.update(g, opt_state)
        return optax.apply_updates(params, u), state, opt_state, loss

    losses = []
    for _ in range(25):
        params, state, opt_state, loss = step(params, state, opt_state)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])


def test_ssd_loss_decreases(rng):
    from tlxcv_tpu.models.detection.ssd import SSD

    model = SSD(num_classes=3, image_size=(96, 96), keep_top_k=10)
    params, state = split(model)
    x = jnp.asarray(rng.normal(size=(2, 96, 96, 3)), jnp.float32)
    boxes = np.zeros((2, 4, 4), np.float32)
    boxes[:, :2] = np.sort(rng.uniform(0.2, 0.8, size=(2, 2, 2, 2)),
                           axis=2).reshape(2, 2, 4)
    targets = {"boxes": jnp.asarray(boxes),
               "class_labels": jnp.asarray(
                   rng.integers(0, 3, size=(2, 4)), jnp.int32)}

    lp = pure(model, lambda m, x, t: m.loss_fn(m(x), t))
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, state, opt_state):
        def lf(p):
            loss, ns = lp(p, state, x, targets, training=True,
                          rngs=Rngs(jax.random.key(0)))
            return loss, ns
        (loss, state), g = jax.value_and_grad(lf, has_aux=True)(params)
        u, opt_state = tx.update(g, opt_state)
        return optax.apply_updates(params, u), state, opt_state, loss

    losses = []
    for _ in range(20):
        params, state, opt_state, loss = step(params, state, opt_state)
        losses.append(float(loss))
    assert np.isfinite(losses).all(), losses
    assert losses[-1] < losses[0] * 0.7, (losses[0], losses[-1])


def test_ppyoloe_loss_decreases(rng):
    from tlxcv_tpu.models.detection.ppyoloe import ppyoloe

    model = ppyoloe("ppyoloe_s", num_classes=3)
    params, state = split(model)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
    boxes = np.zeros((2, 3, 4), np.float32)
    boxes[:, :2, :2] = rng.uniform(5, 25, size=(2, 2, 2))
    boxes[:, :2, 2:] = boxes[:, :2, :2] + rng.uniform(15, 30, size=(2, 2, 2))
    targets = {"boxes": jnp.asarray(boxes),
               "class_labels": jnp.asarray(
                   rng.integers(0, 3, size=(2, 3)), jnp.int32)}

    def call(m, x, t):
        out = m(x, epoch_id=100)  # TaskAligned phase
        return m.loss_fn(out, t)

    lp = pure(model, call)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, state, opt_state):
        def lf(p):
            loss, ns = lp(p, state, x, targets, training=True,
                          rngs=Rngs(jax.random.key(0)))
            return loss, ns
        (loss, state), g = jax.value_and_grad(lf, has_aux=True)(params)
        u, opt_state = tx.update(g, opt_state)
        return optax.apply_updates(params, u), state, opt_state, loss

    losses = []
    for _ in range(60):
        params, state, opt_state, loss = step(params, state, opt_state)
        losses.append(float(loss))
    assert np.isfinite(losses).all(), losses
    # TaskAligned from COLD start is non-monotone BY DESIGN of the fixed
    # assigner (r4): alignment = score * iou^6 starts ~0, so the loss
    # begins tiny, GROWS while scores warm up, then optimizes down — a
    # first-20-steps "must decrease" check only passed against the buggy
    # cutoff assigner that dropped all positives.  Assert the real
    # contract: the loss comes well off its warm-up peak.
    peak = max(losses)
    assert losses[-1] < peak * 0.6, (losses[0], peak, losses[-1])
    assert losses.index(peak) < len(losses) - 5, losses[-8:]


def test_yolov3_overfit_to_map(rng):
    """Train -> predict -> CocoEvaluator integration: YOLOv3 overfits two
    painted boxes and the on-device predict path feeds the native mAP
    evaluator with detections that localize them (mAP@0.5 well above
    chance)."""
    import time

    from tlxcv_tpu.utils.coco_eval import compute_map

    x = rng.normal(size=(2, 64, 64, 3)).astype(np.float32) * 0.3
    boxes = np.zeros((2, 4, 4), np.float32)
    boxes[0, 0] = [0.3, 0.3, 0.4, 0.4]
    boxes[0, 1] = [0.7, 0.7, 0.3, 0.3]
    boxes[1, 0] = [0.5, 0.4, 0.5, 0.4]
    labels = np.zeros((2, 4), np.int32)
    labels[0, 1] = 1
    for b in range(2):
        for i in range(2 if b == 0 else 1):
            cx, cy, w, h = boxes[b, i]
            x0, y0 = int((cx - w / 2) * 64), int((cy - h / 2) * 64)
            x1, y1 = int((cx + w / 2) * 64), int((cy + h / 2) * 64)
            x[b, y0:y1, x0:x1, labels[b, i]] += 2.0

    model = YOLOv3(num_classes=2, use_matrix_nms=True, score_threshold=0.3,
                   keep_top_k=10)
    params, state = split(model)
    targets = {"boxes": jnp.asarray(boxes),
               "class_labels": jnp.asarray(labels)}
    lp = pure(model, lambda m, v, t: m.loss_fn(m(v), t))
    fwd = pure(model)
    tx = optax.adam(2e-3)
    ost = tx.init(params)
    xj = jnp.asarray(x)

    @jax.jit
    def step(p, s, o):
        def lf(pp):
            loss, ns = lp(pp, s, xj, targets, training=True,
                          rngs=Rngs(jax.random.key(0)))
            return loss, ns

        (l, s2), g = jax.value_and_grad(lf, has_aux=True)(p)
        u, o = tx.update(g, o)
        return optax.apply_updates(p, u), s2, o, l

    for _ in range(150):
        params, state, ost, loss = step(params, state, ost)

    (dets, counts), _ = jax.jit(
        lambda p, s, v: fwd(p, s, v, training=False))(params, state, xj)
    dets, counts = np.asarray(dets), np.asarray(counts)
    assert counts.sum() >= 2  # it detects something on both images

    preds, gts = [], []
    for b in range(2):
        n = int(counts[b])
        preds.append({"boxes": dets[b, :n, 2:6],
                      "labels": dets[b, :n, 0].astype(int),
                      "scores": dets[b, :n, 1]})
        valid = boxes[b, :, 2] > 0
        bx = boxes[b][valid]
        xy = np.concatenate([(bx[:, :2] - bx[:, 2:] / 2) * 64,
                             (bx[:, :2] + bx[:, 2:] / 2) * 64], -1)
        gts.append({"boxes": xy, "labels": labels[b][valid]})
    res = compute_map(preds, gts)
    assert res["map50"] >= 0.45, res
