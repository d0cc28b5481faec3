"""Prediction-head init sanity (the r2 bug class, found again in r4).

Few-output-channel prediction convs with the framework-default kaiming
fan_out init get std ~0.3-0.5 and saturate heads at init: SSD plateaued
at fixture mAP .23 (mAP75 .11) and YOLOv3 at .55 (mAP50 .87 but mAP75
.60) before their heads were switched to normal(0.01); the CycleGAN
generator's tanh head saturated outright (G loss pinned at the max-error
cycle term for 900 steps).  These tests pin the *measurable symptom*:
head outputs at init must be small.
"""
import jax
import jax.numpy as jnp
import numpy as np

from tlxcv_tpu.core import pure, split
from tlxcv_tpu.core.init import set_seed


def _forward(model, x, training=True):
    params, state = split(model)
    out, _ = pure(model)(params, state, x, training=training)
    return out


def test_ssd_head_outputs_small_at_init():
    set_seed(0)
    from tlxcv_tpu.models.detection import SSD

    m = SSD(num_classes=3, image_size=(128, 128))
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 128, 128, 3)).astype(np.float32))
    out = _forward(m, x, training=True)
    assert float(jnp.std(out["boxes"])) < 1.0
    assert float(jnp.std(out["scores"])) < 1.0


def test_yolov3_head_outputs_small_at_init():
    set_seed(0)
    from tlxcv_tpu.models.detection import YOLOv3

    m = YOLOv3(num_classes=3)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(1, 128, 128, 3)).astype(np.float32))
    params, state = split(m)
    outs, _ = pure(m, lambda mm, v: mm.head_outputs(v))(
        params, state, x, training=True)
    for o in outs:
        assert float(jnp.std(o)) < 1.0


def test_cyclegan_generator_tanh_unsaturated_at_init():
    set_seed(0)
    from tlxcv_tpu.models.gan.cyclegan import ResnetGenerator

    g = ResnetGenerator(ngf=32, n_blocks=2)
    x = jnp.asarray(np.random.default_rng(0).uniform(
        -1, 1, size=(2, 64, 64, 3)).astype(np.float32))
    y = _forward(g, x, training=True)
    # saturated tanh -> |y| ~ 1 almost everywhere; healthy init stays low
    assert float(jnp.mean(jnp.abs(y) > 0.95)) < 0.2
