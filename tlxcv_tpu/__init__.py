"""tlxcv_tpu — a TPU-native (JAX/XLA/Pallas) computer-vision framework.

A from-scratch rebuild of the capabilities of tensorlayer/TLXCV
(reference at /root/reference): image classification, object detection,
semantic segmentation, human pose estimation, facial landmarks, face
recognition, OCR, video classification, GANs, and remote sensing — as
pure-JAX NHWC models with jit-compiled train/predict steps, Mesh-based
multi-chip sharding, and Pallas kernels on the hot paths.
"""
__version__ = "0.1.0"

from . import core, data, models, nn, ops, parallel, tasks, train, utils
from .train import Model, Trainer

__all__ = ["core", "data", "models", "nn", "ops", "parallel", "tasks",
           "train", "utils", "Model", "Trainer", "__version__"]
