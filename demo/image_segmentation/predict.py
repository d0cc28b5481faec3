"""Segmentation predict on a fresh synthetic circle image
(reference demo/image_segmentation/predict.py)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))
import numpy as np

from tlxcv_tpu.data import Circles
from tlxcv_tpu.models.segmentation import Unet
from tlxcv_tpu.tasks.image_segmentation import ImageSegmentation
from tlxcv_tpu.train import Trainer

if __name__ == "__main__":
    model = ImageSegmentation(Unet(nx=172, ny=172, channels=1, num_classes=2))
    model.load_weights("./demo/image_segmentation/model.npz")
    trainer = Trainer(network=model)

    image, mask = Circles(1, nx=172, ny=172, seed=42)[0]
    logits = np.asarray(trainer.predict(image[None]))
    pred = logits.argmax(-1)[0]
    print("predicted foreground fraction:", (pred == 1).mean())
