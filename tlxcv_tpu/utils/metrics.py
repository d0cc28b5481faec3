"""Metrics with the update/result/reset protocol (tlx convention,
reference demo/object_detection/train.py:88-99 EmptyMetric)."""
from __future__ import annotations

import numpy as np

__all__ = ["Metric", "Accuracy", "TopKAccuracy", "EmptyMetric", "MeanIoU"]


class Metric:
    def update(self, y_pred, y_true):  # pragma: no cover - abstract
        raise NotImplementedError

    def result(self):  # pragma: no cover - abstract
        raise NotImplementedError

    def reset(self):  # pragma: no cover - abstract
        raise NotImplementedError


class Accuracy(Metric):
    def __init__(self):
        self.correct = 0
        self.total = 0

    def update(self, y_pred, y_true):
        y_pred = np.asarray(y_pred)
        y_true = np.asarray(y_true)
        if y_pred.ndim > y_true.ndim:
            y_pred = y_pred.argmax(-1)
        self.correct += int((y_pred == y_true).sum())
        self.total += int(y_true.size)

    def result(self):
        return self.correct / max(self.total, 1)

    def reset(self):
        self.correct = 0
        self.total = 0


class TopKAccuracy(Metric):
    def __init__(self, k=5):
        self.k = k
        self.correct = 0
        self.total = 0

    def update(self, logits, y_true):
        logits = np.asarray(logits)
        y_true = np.asarray(y_true).reshape(-1)
        topk = np.argsort(-logits, axis=-1)[:, :self.k]
        self.correct += int((topk == y_true[:, None]).any(-1).sum())
        self.total += len(y_true)

    def result(self):
        return self.correct / max(self.total, 1)

    def reset(self):
        self.correct = 0
        self.total = 0


class MeanIoU(Metric):
    """Streaming mIoU over argmax predictions."""

    def __init__(self, num_classes):
        self.num_classes = num_classes
        self.reset()

    def update(self, y_pred, y_true):
        pred = np.asarray(y_pred)
        true = np.asarray(y_true)
        # Accepts any mix of logits [..., C] / one-hot [..., C] / int
        # labels [...]. A trailing class axis is detected by rank
        # difference, or — when ranks match — by a float class-sized
        # last axis (both sides are then distributions).
        both_dist = (pred.ndim == true.ndim
                     and pred.shape[-1] == self.num_classes
                     and not np.issubdtype(true.dtype, np.integer))
        if pred.ndim > true.ndim or both_dist:
            pred = pred.argmax(-1)
        if true.ndim > pred.ndim or both_dist:
            true = true.argmax(-1)
        k = self.num_classes
        idx = k * true.reshape(-1).astype(np.int64) + pred.reshape(-1)
        self.conf += np.bincount(idx, minlength=k * k).reshape(k, k)

    def result(self):
        inter = np.diag(self.conf)
        union = self.conf.sum(0) + self.conf.sum(1) - inter
        valid = union > 0
        return float((inter[valid] / union[valid]).mean()) if valid.any() else 0.0

    def reset(self):
        self.conf = np.zeros((self.num_classes, self.num_classes), np.int64)


class EmptyMetric(Metric):
    def update(self, *a, **k):
        pass

    def result(self):
        return 0.0

    def reset(self):
        pass
