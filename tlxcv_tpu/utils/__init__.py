from . import checkpoint, metrics
from .checkpoint import TrainCheckpoint, load_weights, save_weights
from .metrics import Accuracy, EmptyMetric, MeanIoU, Metric, TopKAccuracy

__all__ = ["checkpoint", "metrics", "TrainCheckpoint", "load_weights",
           "save_weights", "Accuracy", "EmptyMetric", "MeanIoU", "Metric",
           "TopKAccuracy"]
