"""Facial landmark detection task + NME metric
(reference tlxcv/tasks/facial_landmark_detection.py:8-83)."""
from __future__ import annotations

import numpy as np

from .. import nn
from ..utils.metrics import Metric


class FacialLandmarkDetection(nn.Module):
    def __init__(self, backbone: nn.Module):
        self.backbone = backbone

    def loss_fn(self, output, target):
        return self.backbone.loss_fn(output, target)

    def __call__(self, inputs):
        return self.backbone(inputs)

    def predict(self, inputs):
        landmarks, _ = self.backbone(inputs)
        return landmarks


def draw_landmarks(image, landmarks, color=(0, 255, 0), radius=2):
    """(reference :28-36) — host-side cv2 drawing."""
    import cv2

    img = np.ascontiguousarray(np.asarray(image))
    pts = np.asarray(landmarks).reshape(-1, 2)
    for x, y in pts:
        cv2.circle(img, (int(x), int(y)), radius, color, -1)
    return img


class NME(Metric):
    """Normalized mean error, inter-ocular normalization for the 68-point
    layout (reference :39-83)."""

    def __init__(self, num_points=68):
        self.num_points = num_points
        self.reset()

    def update(self, y_pred, y_true):
        if isinstance(y_pred, (tuple, list)):
            y_pred = y_pred[0]  # model output (landmarks, features)
        pred = np.asarray(y_pred)
        if isinstance(y_true, (tuple, list)):
            y_true = y_true[0]
        true = np.asarray(y_true)
        pred = pred.reshape(pred.shape[0], -1, 2)
        true = true.reshape(true.shape[0], -1, 2)
        for p, t in zip(pred, true):
            if self.num_points == 68:
                # inter-ocular: outer eye corners 36 and 45
                norm = np.linalg.norm(t[36] - t[45])
            else:
                norm = np.sqrt(t.shape[0])
            dist = np.mean(np.linalg.norm(p - t, axis=1))
            self.errors.append(dist / max(norm, 1e-6))

    def result(self):
        return float(np.mean(self.errors)) if self.errors else 0.0

    def reset(self):
        self.errors = []
