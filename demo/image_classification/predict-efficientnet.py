"""CIFAR-10 EfficientNet-B0 predict (reference demo/image_classification/predict-efficientnet.py)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))
from _variant_common import predict_classifier

if __name__ == "__main__":
    predict_classifier("efficientnet_b0", **{})
