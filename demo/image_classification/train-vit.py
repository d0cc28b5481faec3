"""CIFAR-10 ViT-S/16 train (reference demo/image_classification/train-vit.py)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))
from _variant_common import train_classifier

if __name__ == "__main__":
    train_classifier("vit_small_patch16_224", **{})
