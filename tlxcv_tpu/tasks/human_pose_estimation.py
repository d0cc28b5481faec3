"""Human pose estimation task: task head, PCK metric, vectorized heatmap
target generation (reference tlxcv/tasks/human_pose_estimation.py:21-174
and demo/human_pose_estimation/transform.py:63-143 — the reference stamps
gaussians per joint in host numpy; here it's one broadcast jnp expression
usable on device or host)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import nn
from ..models.human_pose_estimation.hrnet import heatmap_mse_loss
from ..utils.metrics import Metric


class HumanPoseEstimation(nn.Module):
    def __init__(self, backbone: nn.Module):
        self.backbone = backbone

    def loss_fn(self, output, target):
        if isinstance(target, (tuple, list)):
            target, target_weight = target[0], target[1]
        else:
            target_weight = None
        return heatmap_mse_loss(output, target, target_weight)

    def __call__(self, inputs):
        return self.backbone(inputs)

    def predict(self, inputs):
        return self.backbone(inputs)


def generate_heatmap_target(keypoints, input_size=(256, 256),
                            heatmap_size=(64, 64), sigma=2.0):
    """Vectorized gaussian heatmap targets.

    keypoints: [..., J, 3] (x, y, visibility) in input-image pixels.
    Returns (target [..., Hh, Hw, J], target_weight [..., J]).
    """
    keypoints = jnp.asarray(keypoints, jnp.float32)
    hh, hw = heatmap_size
    stride = (jnp.asarray(input_size, jnp.float32) /
              jnp.asarray(heatmap_size, jnp.float32))  # (sy, sx)
    mu_x = jnp.floor(keypoints[..., 0] / stride[1] + 0.5)
    mu_y = jnp.floor(keypoints[..., 1] / stride[0] + 0.5)
    vis = jnp.minimum(keypoints[..., 2], 1.0)
    tmp = 3 * sigma
    inside = ((mu_x - tmp < hw) & (mu_y - tmp < hh) &
              (mu_x + tmp + 1 >= 0) & (mu_y + tmp + 1 >= 0))
    weight = jnp.where(inside, vis, 0.0)

    ys = jax.lax.broadcasted_iota(jnp.float32, (hh, hw), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (hh, hw), 1)
    # [..., J, Hh, Hw]
    d2 = ((xs - mu_x[..., None, None]) ** 2 +
          (ys - mu_y[..., None, None]) ** 2)
    g = jnp.exp(-d2 / (2 * sigma ** 2))
    g = g * (weight[..., None, None] > 0.5)
    return jnp.moveaxis(g, -3, -1), weight


class GenerateTarget:
    """Per-sample transform wrapper (host side, numpy in / numpy out —
    pure numpy: running jnp here put several device dispatches inside
    the data-loading path, ~0.86 ms each on the axon relay and exposed
    to relay wedges; same math as generate_heatmap_target, unit-tested
    equal)."""

    def __init__(self, size=(256, 256), num_of_joints=17,
                 heatmap_size=(64, 64), sigma=2):
        self.size = size
        self.num_of_joints = num_of_joints
        self.heatmap_size = heatmap_size
        self.sigma = sigma

    def __call__(self, data):
        image, label = data
        kp = np.asarray(label, np.float32)
        if kp.shape[-2] != self.num_of_joints:
            raise ValueError(
                f"expected {self.num_of_joints} joints, got {kp.shape}")
        hh, hw = self.heatmap_size
        sy = self.size[0] / self.heatmap_size[0]
        sx = self.size[1] / self.heatmap_size[1]
        mu_x = np.floor(kp[..., 0] / sx + 0.5)
        mu_y = np.floor(kp[..., 1] / sy + 0.5)
        vis = np.minimum(kp[..., 2], 1.0)
        tmp = 3 * self.sigma
        inside = ((mu_x - tmp < hw) & (mu_y - tmp < hh) &
                  (mu_x + tmp + 1 >= 0) & (mu_y + tmp + 1 >= 0))
        weight = np.where(inside, vis, 0.0).astype(np.float32)
        ys, xs = np.mgrid[0:hh, 0:hw].astype(np.float32)
        d2 = ((xs - mu_x[..., None, None]) ** 2 +
              (ys - mu_y[..., None, None]) ** 2)
        g = np.exp(-d2 / (2 * self.sigma ** 2))
        g = g * (weight[..., None, None] > 0.5)
        target = np.moveaxis(g, -3, -1).astype(np.float32)
        return image, (target, weight)


def get_max_preds(heatmap):
    """Heatmap argmax decode (reference :127-137). heatmap NHWC."""
    heatmap = np.asarray(heatmap)
    b, h, w, j = heatmap.shape
    flat = heatmap.reshape(b, -1, j)
    idx = np.argmax(flat, axis=1)
    maxval = np.amax(flat, axis=1)
    x, y = idx % w, idx // w
    preds = np.dstack((x, y)).astype(np.float32)
    preds[maxval <= 0] = -1
    return preds, maxval


class PCK(Metric):
    """Percentage of correct keypoints (reference :140-174)."""

    def __init__(self, threshold=0.05):
        self.threshold = threshold
        self.reset()

    def update(self, y_pred, y_true):
        if isinstance(y_true, (tuple, list)):
            y_true = y_true[0]
        pred_hm = np.asarray(y_pred)
        true_hm = np.asarray(y_true)
        _, h, w, _ = pred_hm.shape
        pred, _ = get_max_preds(pred_hm)
        target, _ = get_max_preds(true_hm)
        pred = pred / (w, h)
        target_n = target / (w, h)
        dist = np.linalg.norm(pred - target_n, axis=-1)
        mask = (target >= 0).all(axis=-1)
        self.correct += int((dist[mask] < self.threshold).sum())
        self.total += int(mask.sum())

    def result(self):
        return self.correct / max(self.total, 1)

    def reset(self):
        self.correct = 0
        self.total = 0
