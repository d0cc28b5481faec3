"""fastfcn segmentation predict
(reference demo/image_segmentation/predict-fastfcn.py)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))
import numpy as np

from tlxcv_tpu.models.segmentation import fastfcn
from tlxcv_tpu.data import Circles
from tlxcv_tpu.tasks.image_segmentation import ImageSegmentation
from tlxcv_tpu.train import Trainer

if __name__ == "__main__":
    ds = Circles(1, nx=64, ny=64, nc=3, seed=2)
    image, mask = ds[0]

    model = ImageSegmentation(fastfcn(num_classes=2))
    model.load_weights("./demo/image_segmentation/fastfcn.npz")
    trainer = Trainer(network=model)
    logits = np.asarray(trainer.predict(image[None]))
    pred = logits.argmax(-1)[0]
    gt = np.asarray(mask).argmax(-1)
    acc = float((pred == gt).mean())
    print(f"fastfcn: predicted circle pixels "
          f"{int((pred == 1).sum())}, accuracy vs GT {acc:.4f}")
