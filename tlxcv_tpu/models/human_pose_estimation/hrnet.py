"""Pose HRNet (reference
tlxcv/models/human_pose_estimation/hrnet.py:436 PoseHighResolutionNet —
HRNet-W32, 17 COCO joints, heatmap MSE loss :651-664), built on the
shared HRNet core."""
from __future__ import annotations

import jax.numpy as jnp

from ... import nn
from ..backbones.hrnet import HRNet, hrnet_w32

__all__ = ["PoseHighResolutionNet", "pose_hrnet_w32", "heatmap_mse_loss"]


def heatmap_mse_loss(output, target, target_weight=None):
    """Per-joint weighted heatmap MSE (reference hrnet.py:651-664).

    output/target: [B, H, W, J]; target_weight: [B, J] or [B, J, 1].
    """
    b, h, w, j = output.shape
    pred = output.reshape(b, -1, j)
    gt = target.reshape(b, -1, j)
    if target_weight is not None:
        tw = target_weight.reshape(b, 1, j)
        pred = pred * tw
        gt = gt * tw
    return 0.5 * jnp.mean((pred - gt) ** 2) * j


class PoseHighResolutionNet(nn.Module):
    def __init__(self, num_joints=17, width=32, backbone: HRNet = None):
        from ...core import init as _I

        self.backbone = backbone if backbone is not None else hrnet_w32()
        # MMPose final-layer convention: normal(0.001) — kaiming fan_out
        # on a num_joints-channel 1x1 conv gives std ~0.6 and a huge
        # initial heatmap MSE (BENCHMARKS.md head-init note)
        self.final_layer = nn.Conv2d(self.backbone.branch_channels[0],
                                     num_joints, 1,
                                     w_init=lambda s: _I.normal(s, std=0.001))
        self.num_joints = num_joints

    def __call__(self, x):
        feats = self.backbone(x)
        return self.final_layer(feats[0])  # highest-resolution branch

    def loss_fn(self, output, target, target_weight=None):
        if isinstance(target, (tuple, list)):
            target, target_weight = target
        elif isinstance(target, dict):
            target_weight = target.get("target_weight")
            target = target["target"]
        return heatmap_mse_loss(output, target, target_weight)


def pose_hrnet_w32(num_joints=17, **kw):
    return PoseHighResolutionNet(num_joints=num_joints, width=32, **kw)
