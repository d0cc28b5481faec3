"""Segmentation zoo + HRNet/pose smoke tests: build, forward, shapes."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tlxcv_tpu.core import pure, split
from tlxcv_tpu.models import segmentation as S
from tlxcv_tpu.models.backbones import hrnet_w18_small_v1, resnet18_vd
from tlxcv_tpu.models.human_pose_estimation import (PoseHighResolutionNet,
                                                    heatmap_mse_loss)

NC = 7


def _run(model, size=64, channels=3, train=False):
    params, state = split(model)
    fwd = pure(model)
    x = jnp.zeros((1, size, size, channels), jnp.float32)
    rngs = jax.random.key(0) if train else None
    out, _ = jax.jit(lambda p, s, x: fwd(p, s, x, training=train,
                                         rngs=rngs))(params, state, x)
    return out


def test_fastscnn_shapes():
    out = _run(S.FastSCNN(num_classes=NC), 64)
    assert out.shape == (1, 64, 64, NC)


def test_bisenetv2_eval_and_train_aux():
    m = S.BiSeNetV2(num_classes=NC)
    out = _run(m, 64)
    assert out.shape == (1, 64, 64, NC)
    outs = _run(m, 64, train=True)
    assert isinstance(outs, list) and len(outs) == 5
    assert all(o.shape == (1, 64, 64, NC) for o in outs)


def test_enet_shapes():
    out = _run(S.ENet(num_classes=NC), 64)
    assert out.shape == (1, 64, 64, NC)


def test_deeplabv3p_small_backbone():
    m = S.DeepLabV3P(num_classes=NC, backbone=resnet18_vd(output_stride=8))
    out = _run(m, 64)
    assert out.shape == (1, 64, 64, NC)


def test_fastfcn_small_backbone():
    m = S.FastFCN(num_classes=NC,
                  backbone=resnet18_vd(output_stride=32))
    out = _run(m, 64)
    assert out.shape == (1, 64, 64, NC)


def test_encnet_small_backbone():
    m = S.ENCNet(num_classes=NC, backbone=resnet18_vd())
    out = _run(m, 64)
    assert out.shape == (1, 64, 64, NC)


def test_hrnet_fcn():
    m = S.FCN(num_classes=NC, backbone=hrnet_w18_small_v1())
    out = _run(m, 64)
    assert out.shape == (1, 64, 64, NC)


def test_pose_hrnet_and_loss():
    m = PoseHighResolutionNet(num_joints=17, backbone=hrnet_w18_small_v1())
    params, state = split(m)
    fwd = pure(m)
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    out, _ = jax.jit(lambda p, s, x: fwd(p, s, x))(params, state, x)
    assert out.shape == (2, 16, 16, 17)
    target = jnp.zeros_like(out)
    tw = jnp.ones((2, 17))
    loss = heatmap_mse_loss(out, target, tw)
    assert np.isfinite(float(loss))


def test_heatmap_target_generation():
    from tlxcv_tpu.tasks.human_pose_estimation import (PCK,
                                                       generate_heatmap_target)

    kp = np.zeros((2, 17, 3), np.float32)
    kp[..., 0] = np.linspace(10, 240, 17)
    kp[..., 1] = 128
    kp[..., 2] = 1
    kp[0, 3, 2] = 0  # invisible joint
    target, weight = generate_heatmap_target(kp, (256, 256), (64, 64))
    assert target.shape == (2, 64, 64, 17)
    assert weight.shape == (2, 17)
    assert float(weight[0, 3]) == 0.0
    t = np.asarray(target)
    # gaussian peak at the expected cell for a visible joint
    j = 8
    mu_x = int(kp[0, j, 0] / 4 + 0.5)
    mu_y = int(kp[0, j, 1] / 4 + 0.5)
    assert t[0, mu_y, mu_x, j] == t[0, :, :, j].max() > 0.99

    # PCK of perfect prediction is 1.0
    m = PCK()
    m.update(target, target)
    assert m.result() == 1.0
