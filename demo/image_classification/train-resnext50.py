"""CIFAR-10 ResNeXt50-32x4d train (reference demo/image_classification/train-resnext50.py)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))
from _variant_common import train_classifier

if __name__ == "__main__":
    train_classifier("resnext50_32x4d", **{})
