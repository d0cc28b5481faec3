"""CIFAR-10 MobileNetV1 train (reference demo/image_classification/train-mobilenet.py)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))
from _variant_common import train_classifier

if __name__ == "__main__":
    train_classifier("mobilenet_v1", **{})
