"""PFLD, RetinaFace, ArcFace, I3D, and the face task codecs."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tlxcv_tpu.core import pure, split


def test_pfld_forward_and_loss(rng):
    from tlxcv_tpu.models.facial_landmark_detection import PFLD

    model = PFLD()
    params, state = split(model)
    x = jnp.asarray(rng.normal(size=(2, 112, 112, 3)), jnp.float32)

    def call(m, x, t):
        return m.loss_fn(m(x), t)

    landmark_gt = jnp.asarray(rng.uniform(0, 112, size=(2, 136)), jnp.float32)
    euler_gt = jnp.asarray(rng.normal(size=(2, 3)), jnp.float32)
    lp = pure(model, call)
    loss, _ = jax.jit(lambda p, s: lp(p, s, x, (landmark_gt, euler_gt),
                                      training=True))(params, state)
    assert np.isfinite(float(loss))

    fwd = pure(model)
    (landmarks, feats), _ = fwd(params, state, x)
    assert landmarks.shape == (2, 136)
    assert feats.shape == (2, 28, 28, 64)


def test_retinaface_and_codec(rng):
    from tlxcv_tpu.models.face_recognition import RetinaFace
    from tlxcv_tpu.tasks.face_recognition import (Decoder, Encoder, nms_np,
                                                  prior_box)

    size = 128
    model = RetinaFace(input_size=size)
    params, state = split(model)
    fwd = pure(model)
    x = jnp.asarray(rng.normal(size=(1, size, size, 3)), jnp.float32)
    (bbox, landm, cls), _ = jax.jit(lambda p, s, x: fwd(p, s, x))(params, state, x)
    priors = prior_box((size, size))
    assert bbox.shape == (1, priors.shape[0], 4)
    assert landm.shape == (1, priors.shape[0], 10)
    assert cls.shape == (1, priors.shape[0], 2)
    np.testing.assert_allclose(np.asarray(cls).sum(-1), 1.0, atol=1e-5)

    # encoder/decoder roundtrip on the matched prior
    labels = np.zeros((1, 15), np.float32)
    labels[0, :4] = [0.3, 0.3, 0.6, 0.6]
    labels[0, 4:14] = 0.45
    labels[0, 14] = 1
    enc = Encoder(priors)
    encoded = enc(labels)
    assert encoded.shape == (priors.shape[0], 16)
    pos = encoded[:, 15] == 1
    assert pos.sum() >= 1
    dec = Decoder()
    decoded = dec.decode_bbox(encoded[pos][:, :4], priors[pos])
    np.testing.assert_allclose(decoded, np.tile(labels[0, :4], (pos.sum(), 1)),
                               atol=1e-4)

    # training loss finite
    y = jnp.asarray(encoded[None])
    lp = pure(model, lambda m, x, t: m.loss_fn(m(x), t))
    loss, _ = lp(params, state, x, y, training=True)
    assert np.isfinite(float(loss))

    keep = nms_np(np.asarray([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60.0]]),
                  np.asarray([0.9, 0.8, 0.7]), 0.4)
    assert list(keep) == [0, 2]


def test_arcface_margin_and_loss(rng):
    from tlxcv_tpu.models.backbones.hrnet import ConvBNReLU  # noqa: F401
    from tlxcv_tpu.models.classification import resnet18
    from tlxcv_tpu.models.face_recognition import ArcFace

    model = ArcFace(input_size=64, embed_size=32, num_classes=10,
                    backbone=resnet18(num_classes=0, with_pool=False))
    params, state = split(model)
    x = jnp.asarray(rng.normal(size=(4, 64, 64, 3)), jnp.float32)
    labels = jnp.asarray([0, 1, 2, 3], jnp.int32)

    emb_fn = pure(model, lambda m, x: m.embed(x))
    emb, _ = emb_fn(params, state, x)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(emb), axis=1), 1.0,
                               atol=1e-4)

    lp = pure(model, lambda m, x, y: m.loss_fn(m.embed(x), y))
    loss, _ = lp(params, state, x, labels, training=False)
    assert np.isfinite(float(loss))
    # margin penalizes the true class: loss with margin >= loss without
    head = model.head
    e, _ = emb_fn(params, state, x)
    logits_m = head(e, labels)
    cos = np.asarray(e @ (head.weight.value /
                          jnp.linalg.norm(head.weight.value, axis=0)))
    true_margin = np.asarray(logits_m)[np.arange(4), np.asarray(labels)]
    true_plain = cos[np.arange(4), np.asarray(labels)] * head.logist_scale
    assert (true_margin <= true_plain + 1e-3).all()
    # dynamic margin override: 0.5 matches the baked consts exactly,
    # 0.0 degenerates to plain normalized softmax logits
    logits_dyn = head(e, labels, margin=jnp.float32(0.5))
    np.testing.assert_allclose(np.asarray(logits_dyn), np.asarray(logits_m),
                               atol=1e-5)
    logits_0 = head(e, labels, margin=jnp.float32(0.0))
    np.testing.assert_allclose(np.asarray(logits_0),
                               cos * head.logist_scale, atol=1e-3)


def test_i3d_shapes(rng):
    from tlxcv_tpu.models.video_classification import InceptionI3d
    from tlxcv_tpu.tasks import VideoClassification

    model = VideoClassification(InceptionI3d(num_classes=7))
    params, state = split(model)
    fwd = pure(model)
    x = jnp.asarray(rng.normal(size=(1, 8, 64, 64, 3)), jnp.float32)
    out, _ = jax.jit(lambda p, s, x: fwd(p, s, x))(params, state, x)
    assert out.shape[0] == 1 and out.shape[-1] == 7
    target = jnp.zeros(out.shape)
    assert np.isfinite(float(model.loss_fn(out, target)))


def test_i3d_learns_multilabel(rng):
    """Video learn loop: micro-I3D overfits per-frame multi-label targets
    (BCE falls by >5x)."""
    import optax

    from tlxcv_tpu.core import Rngs
    from tlxcv_tpu.models.video_classification import InceptionI3d
    from tlxcv_tpu.tasks import VideoClassification

    model = VideoClassification(InceptionI3d(num_classes=5))
    params, state = split(model)
    x = jnp.asarray(rng.normal(size=(2, 8, 64, 64, 3)), jnp.float32)
    out0, _ = pure(model)(params, state, x)
    t = out0.shape[1]
    y = jnp.asarray(rng.integers(0, 2, size=(2, t, 5)), jnp.float32)

    lp = pure(model, lambda m, v, tt: m.loss_fn(m(v), tt))
    tx = optax.adam(2e-3)
    ost = tx.init(params)

    @jax.jit
    def step(p, s, o):
        def lf(pp):
            loss, ns = lp(pp, s, x, y, training=True,
                          rngs=Rngs(jax.random.key(0)))
            return loss, ns

        (l, s2), g = jax.value_and_grad(lf, has_aux=True)(p)
        u, o = tx.update(g, o)
        return optax.apply_updates(p, u), s2, o, l

    losses = []
    for _ in range(60):
        params, state, ost, loss = step(params, state, ost)
        losses.append(float(loss))
    assert losses[-1] < losses[0] / 5, (losses[0], losses[-1])
