"""PFLD facial-landmark network (reference
tlxcv/models/facial_landmark_detection/pfld.py: pfld_loss :7,
InvertedResidual :48, PFLDBackbone :105, AuxiliaryNet :217, PFLD :258),
NHWC, 112x112 input, 68-point (136-dim) output."""
from __future__ import annotations

import jax.numpy as jnp

from ... import nn

__all__ = ["PFLD", "PFLDBackbone", "AuxiliaryNet", "pfld_loss"]


def pfld_loss(landmarks, angle, landmark_gt, euler_angle_gt, attribute_gt=None):
    """Landmark L2 weighted by (1 - cos(angle error)) and attribute rarity
    (reference :7-30)."""
    b = landmarks.shape[0]
    landmarks = landmarks.reshape(b, -1)
    landmark_gt = landmark_gt.reshape(b, -1)
    weight_angle = jnp.sum(1.0 - jnp.cos(angle - euler_angle_gt), axis=1)
    if attribute_gt is not None:
        attr = attribute_gt.astype(jnp.float32)
        ratio = jnp.mean(attr, axis=0)
        ratio = jnp.where(ratio > 0, 1.0 / jnp.maximum(ratio, 1e-9),
                          float(b))
        weight_attribute = jnp.sum(attr * ratio, axis=1)
    else:
        weight_attribute = 1.0
    l2 = jnp.sum((landmark_gt - landmarks) ** 2, axis=1)
    return jnp.mean(weight_angle * weight_attribute * l2)


class ConvBN(nn.Module):
    def __init__(self, cin, cout, k, stride, padding="same"):
        pad = 0 if padding == "VALID" else (k - 1) // 2
        self.conv = nn.Conv2d(cin, cout, k, stride=stride, padding=pad,
                              bias=False)
        self.bn = nn.BatchNorm(cout)

    def __call__(self, x):
        return nn.relu(self.bn(self.conv(x)))


class InvertedResidual(nn.Module):
    def __init__(self, inp, oup, stride, use_res, expand_ratio=6):
        mid = inp * expand_ratio
        self.use_res = use_res
        self.conv = nn.Sequential(
            nn.Conv2d(inp, mid, 1, bias=False), nn.BatchNorm(mid),
            nn.Activation("relu"),
            nn.Conv2d(mid, mid, 3, stride=stride, padding=1, groups=mid,
                      bias=False),
            nn.BatchNorm(mid), nn.Activation("relu"),
            nn.Conv2d(mid, oup, 1, bias=False), nn.BatchNorm(oup))

    def __call__(self, x):
        out = self.conv(x)
        return x + out if self.use_res else out


class PFLDBackbone(nn.Module):
    def __init__(self, num_landmarks=68):
        self.conv1 = nn.Conv2d(3, 64, 3, stride=2, padding=1, bias=False)
        self.bn1 = nn.BatchNorm(64)
        self.conv2 = nn.Conv2d(64, 64, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm(64)
        self.conv3_1 = InvertedResidual(64, 64, 2, False, 2)
        self.blocks3 = [InvertedResidual(64, 64, 1, True, 2) for _ in range(4)]
        self.conv4_1 = InvertedResidual(64, 128, 2, False, 2)
        self.conv5_1 = InvertedResidual(128, 128, 1, False, 4)
        self.blocks5 = [InvertedResidual(128, 128, 1, True, 4) for _ in range(5)]
        self.conv6_1 = InvertedResidual(128, 16, 1, False, 2)
        self.conv7 = ConvBN(16, 32, 3, 2)
        self.conv8 = nn.Conv2d(32, 128, 7)
        self.bn8 = nn.BatchNorm(128)
        # 112x112 input: x1 = 14*14*16, x2 = 7*7*32, x3 = 1*1*128
        self.fc = nn.Linear(14 * 14 * 16 + 7 * 7 * 32 + 128, num_landmarks * 2)

    def __call__(self, x):
        x = nn.relu(self.bn1(self.conv1(x)))
        x = nn.relu(self.bn2(self.conv2(x)))
        x = self.conv3_1(x)
        for blk in self.blocks3:
            x = blk(x)
        features = x  # [B, 28, 28, 64]
        x = self.conv4_1(features)
        x = self.conv5_1(x)
        for blk in self.blocks5:
            x = blk(x)
        x = self.conv6_1(x)
        x1 = x.reshape(x.shape[0], -1)
        x = self.conv7(x)
        x2 = x.reshape(x.shape[0], -1)
        x = nn.relu(self.conv8(x))
        x3 = x.reshape(x.shape[0], -1)
        landmarks = self.fc(jnp.concatenate([x1, x2, x3], 1))
        return landmarks, features


class AuxiliaryNet(nn.Module):
    """Euler-angle head over the mid-level features (reference :217)."""

    def __init__(self):
        self.conv1 = ConvBN(64, 128, 3, 2)
        self.conv2 = ConvBN(128, 128, 3, 1)
        self.conv3 = ConvBN(128, 32, 3, 2)
        self.conv4 = ConvBN(32, 128, 7, 1, padding="VALID")
        self.fc1 = nn.Linear(128, 32)
        self.fc2 = nn.Linear(32, 3)

    def __call__(self, x):
        x = self.conv4(self.conv3(self.conv2(self.conv1(x))))
        x = x.reshape(x.shape[0], -1)
        return self.fc2(self.fc1(x))


class PFLD(nn.Module):
    def __init__(self, num_landmarks=68):
        self.backbone = PFLDBackbone(num_landmarks)
        self.auxiliarynet = AuxiliaryNet()

    def __call__(self, x):
        return self.backbone(x)

    def loss_fn(self, output, target):
        landmarks, features = output
        angle = self.auxiliarynet(features)
        if len(target) == 3:
            return pfld_loss(landmarks, angle, target[0], target[1], target[2])
        return pfld_loss(landmarks, angle, target[0], target[1], None)
