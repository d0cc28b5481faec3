"""Zero-GT (empty-image) robustness across the detection zoo.

Real COCO contains ~1k images with no annotations; a batch whose every
GT row is padding must still produce a FINITE loss.  The bbox2delta
log(0) landmine (fixed in ops/boxes.py) NaN'd the R-CNN family on such
batches — and the NaN was invisible to the jitted tests because XLA's
mult-by-zero simplification happened to fold the inf*0 away on CPU.
These checks therefore run EAGERLY (strict IEEE semantics, no fusion
luck), one batch per detector, reusing the accuracy-sweep builders.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from tlxcv_tpu.core import pure, split

from demo.object_detection.accuracy_sweep import (M, NC, REGISTRY, SIZE,
                                                  TARGET_ADAPTERS)


def _total(loss):
    if isinstance(loss, (tuple, list)):
        loss = loss[0]
    if isinstance(loss, dict):
        loss = sum(jnp.sum(v) for v in loss.values())
    return float(jnp.sum(loss))


@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_zero_gt_loss_finite(name):
    from tlxcv_tpu.core.init import set_seed

    set_seed(0)
    build = REGISTRY[name][0]
    adapt = TARGET_ADAPTERS.get(name, lambda t: t)
    model = build()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, SIZE, SIZE, 3)), jnp.float32)
    targets = adapt({"boxes": jnp.zeros((1, M, 4), jnp.float32),
                     "class_labels": jnp.zeros((1, M), jnp.int32),
                     "mask": jnp.zeros((1, M), jnp.float32)})
    params, state = split(model)
    lp = pure(model, lambda m, v, t: m.loss_fn(m(v), t))
    loss, _ = lp(params, state, x, targets, training=True)
    total = _total(loss)
    assert np.isfinite(total), f"{name}: zero-GT loss = {total}"


@pytest.mark.slow
def test_zero_gt_loss_finite_solov2():
    """SOLOv2 speaks its own mask-target contract — same empty-image
    check, eager."""
    from tlxcv_tpu.core.init import set_seed
    from tlxcv_tpu.models.classification.resnet import ResNet
    from tlxcv_tpu.models.detection import SOLOv2

    set_seed(0)
    model = SOLOv2(num_classes=5, pre_top_k=32, keep_top_k=10, max_pos=16,
                   backbone=ResNet(depth=18, num_classes=0, with_pool=False))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)), jnp.float32)
    targets = {"boxes": jnp.zeros((1, 3, 4), jnp.float32),
               "class_labels": jnp.zeros((1, 3), jnp.int32),
               "mask": jnp.zeros((1, 3), jnp.float32),
               "masks": jnp.zeros((1, 3, 64, 64), jnp.float32)}
    params, state = split(model)
    lp = pure(model, lambda m, v, t: m.loss_fn(m(v), t))
    loss, _ = lp(params, state, x, targets, training=True)
    assert np.isfinite(_total(loss))
