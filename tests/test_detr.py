"""DETR: frozen BN, matcher-based loss, grads, eval decode."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tlxcv_tpu.core import Param, pure, split
from tlxcv_tpu.models.detection.detr import Detr, DetrLoss


@pytest.fixture(scope="module")
def tiny_detr():
    return Detr(num_classes=5, num_queries=8, dim=32, heads=2, enc_layers=1,
                dec_layers=2, ffn=64, dropout=0.0)


def test_frozen_bn_not_in_params(tiny_detr):
    params, state = split(tiny_detr)
    assert not any("running_mean" in k for k in params)
    # frozen BN weight/bias are state, not trainables
    assert any(k.endswith("bn1/weight") for k in state)
    assert not any(k.endswith("bn1/weight") for k in params)


def test_detr_loss_and_grads(tiny_detr, rng):
    model = tiny_detr
    params, state = split(model)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
    boxes = np.zeros((2, 3, 4), np.float32)
    boxes[:, :2, :2] = rng.uniform(0.3, 0.7, size=(2, 2, 2))
    boxes[:, :2, 2:] = rng.uniform(0.1, 0.2, size=(2, 2, 2))
    targets = {"boxes": jnp.asarray(boxes),
               "class_labels": jnp.asarray(rng.integers(0, 5, size=(2, 3)),
                                           jnp.int32),
               "mask": jnp.asarray([[1, 1, 0], [1, 1, 0]], jnp.float32)}

    def call(m, x, t):
        out = m(x)
        return m.loss_fn(out, t)

    lp = pure(model, call)
    loss, _ = jax.jit(lambda p, s: lp(p, s, x, targets, training=True))(params, state)
    assert np.isfinite(float(loss)) and float(loss) > 0

    g = jax.grad(lambda p: lp(p, state, x, targets, training=True)[0])(params)
    gn = sum(float(jnp.abs(v).sum()) for v in g.values())
    assert np.isfinite(gn) and gn > 0
    assert float(jnp.abs(g["query_embed"]).sum()) > 0


def test_detr_matcher_picks_best_query():
    """Synthetic: queries already at GT positions -> matched 1:1, tiny loss."""
    loss_mod = DetrLoss(num_classes=3)
    q, m = 4, 2
    gt_boxes = jnp.asarray([[[0.2, 0.2, 0.1, 0.1], [0.7, 0.7, 0.2, 0.2]]])
    gt_labels = jnp.asarray([[0, 1]], jnp.int32)
    mask = jnp.ones((1, m))
    pred_boxes = jnp.asarray([[[0.7, 0.7, 0.2, 0.2], [0.5, 0.5, 0.5, 0.5],
                               [0.2, 0.2, 0.1, 0.1], [0.9, 0.1, 0.1, 0.1]]])
    logits = jnp.full((1, q, 4), -5.0)
    logits = logits.at[0, 0, 1].set(5.0)   # query 0 -> class 1 (second gt)
    logits = logits.at[0, 2, 0].set(5.0)   # query 2 -> class 0 (first gt)
    logits = logits.at[0, 1, 3].set(5.0)   # others -> no-object
    logits = logits.at[0, 3, 3].set(5.0)
    loss = float(loss_mod(logits, pred_boxes,
                          {"boxes": gt_boxes, "class_labels": gt_labels,
                           "mask": mask}))
    assert loss < 0.1, loss


def test_detr_eval_predict(tiny_detr, rng):
    model = tiny_detr
    params, state = split(model)
    fwd = pure(model)
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)), jnp.float32)
    out, _ = jax.jit(lambda p, s, x: fwd(p, s, x))(params, state, x)
    assert out["logits"].shape == (1, 8, 6)
    assert out["boxes"].shape == (1, 8, 4)
    labels, scores, boxes = model.predict_boxes(out, (64, 64))
    assert boxes.shape == (1, 8, 4)
    b = np.asarray(boxes)
    assert (b[..., 2:] >= b[..., :2] - 1e-4).all()


def test_auction_matcher_equals_callback_loss(rng):
    """matcher="auction" (the axon-relay path, r4: that PJRT client has
    no host callbacks) must produce the same matching — hence the same
    loss — as the exact scipy callback on well-separated costs."""
    loss_cb = DetrLoss(5, matcher="callback")
    loss_au = DetrLoss(5, matcher="auction")
    b, q, m = 2, 8, 3
    logits = jnp.asarray(rng.normal(size=(b, q, 6)), jnp.float32)
    pred = jnp.asarray(rng.uniform(0.2, 0.8, size=(b, q, 4)), jnp.float32)
    boxes = np.zeros((b, m, 4), np.float32)
    boxes[:, :2, :2] = rng.uniform(0.3, 0.7, size=(b, 2, 2))
    boxes[:, :2, 2:] = rng.uniform(0.1, 0.2, size=(b, 2, 2))
    targets = {"boxes": jnp.asarray(boxes),
               "class_labels": jnp.asarray(
                   rng.integers(0, 5, size=(b, m)), jnp.int32),
               "mask": jnp.asarray([[1, 1, 0], [1, 1, 0]], jnp.float32)}
    l_cb = float(loss_cb(logits, pred, targets))
    l_au = float(loss_au(logits, pred, targets))
    assert np.isfinite(l_au)
    assert abs(l_cb - l_au) < 1e-4 * max(abs(l_cb), 1.0), (l_cb, l_au)


def test_auction_matcher_trains_under_jit(tiny_detr, rng):
    """The auction path must be jit-safe (pure device code, no
    callbacks) and differentiable through the matched losses."""
    model = Detr(num_classes=5, num_queries=8, dim=32, heads=2,
                 enc_layers=1, dec_layers=1, ffn=64, dropout=0.0,
                 matcher="auction")
    params, state = split(model)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
    boxes = np.zeros((2, 3, 4), np.float32)
    boxes[:, :2, :2] = rng.uniform(0.3, 0.7, size=(2, 2, 2))
    boxes[:, :2, 2:] = rng.uniform(0.1, 0.2, size=(2, 2, 2))
    targets = {"boxes": jnp.asarray(boxes),
               "class_labels": jnp.asarray(
                   rng.integers(0, 5, size=(2, 3)), jnp.int32),
               "mask": jnp.asarray([[1, 1, 0], [1, 1, 0]], jnp.float32)}
    lp = pure(model, lambda m, v, t: m.loss_fn(m(v), t))

    @jax.jit
    def step(p):
        def lf(p):
            loss, ns = lp(p, state, x, targets, training=True,
                          rngs=None)
            return loss
        return jax.value_and_grad(lf)(p)

    loss, g = step(params)
    assert np.isfinite(float(loss))
    gn = sum(float(jnp.sum(jnp.abs(v))) for v in g.values())
    assert gn > 0


def test_auto_matcher_detects_axon():
    from tlxcv_tpu.models.detection.detr import _auto_matcher_mode

    assert _auto_matcher_mode("axon,cpu") == "auction"
    assert _auto_matcher_mode("cpu") == "callback"
    assert _auto_matcher_mode("") == "callback"
    assert _auto_matcher_mode("tpu") == "callback"


def test_unassigned_matcher_rows_get_no_supervision(rng):
    """An auction row returned as -1 (iteration-budget exhaustion) must
    be masked out of the loss like a padded row — clamping it to query 0
    scattered TWO gts into one query and trained query 0 toward an
    arbitrary target (r4 review finding)."""
    loss = DetrLoss(5, matcher="auction")
    loss._match = lambda cost: jnp.asarray([[3, -1]], jnp.int32)

    q, m = 6, 2
    logits = jnp.asarray(rng.normal(size=(1, q, 6)), jnp.float32)
    pred = jnp.asarray(rng.uniform(0.2, 0.8, size=(1, q, 4)), jnp.float32)
    targets = {"boxes": jnp.asarray(rng.uniform(0.3, 0.6, size=(1, m, 4)),
                                    jnp.float32),
               "class_labels": jnp.asarray([[1, 2]], jnp.int32),
               "mask": jnp.ones((1, m), jnp.float32)}

    g_logits, g_pred = jax.grad(
        lambda l, p: loss(l, p, targets), argnums=(0, 1))(logits, pred)
    # the unmatched gt supervises NO query's boxes; only query 3 (gt 0)
    # carries box gradient
    gb = np.abs(np.asarray(g_pred)).sum(-1)[0]
    assert gb[3] > 0
    assert np.all(gb[np.arange(q) != 3] == 0)
    # and no query's class target was scattered to gt 1's class: query 0
    # must carry the same CE gradient as any other unmatched query would
    # (its target is no-object, weighted eos_coef), not class-2 pull
    tgt = np.full((q,), 5)
    tgt[3] = 1
    probs = np.asarray(jax.nn.softmax(logits, -1))[0]
    cls_w = np.where(tgt == 5, loss.eos_coef, 1.0)
    expect = probs.copy()
    expect[np.arange(q), tgt] -= 1.0
    expect *= cls_w[:, None] / cls_w.sum()
    np.testing.assert_allclose(np.asarray(g_logits)[0], expect, atol=1e-5)
