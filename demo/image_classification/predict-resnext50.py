"""CIFAR-10 ResNeXt50-32x4d predict (reference demo/image_classification/predict-resnext50.py)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))
from _variant_common import predict_classifier

if __name__ == "__main__":
    predict_classifier("resnext50_32x4d", **{})
