"""Circles + Unet segmentation training
(reference demo/image_segmentation/train-Unet.py — the hermetic
per-model variant)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))
import numpy as np

from tlxcv_tpu.models.segmentation import Unet
from tlxcv_tpu.data import Circles, DataLoader
from tlxcv_tpu.tasks.image_segmentation import Accuracy, ImageSegmentation
from tlxcv_tpu.train import Trainer, optimizers

class CentralCrop:
    def __init__(self, size):
        self.size = size

    def __call__(self, x):
        h, w = self.size
        hd = (x.shape[0] - h) // 2
        wd = (x.shape[1] - w) // 2
        return np.ascontiguousarray(x[hd:hd + h, wd:wd + w])


if __name__ == "__main__":
    train_dataset = Circles(1000, nx=172, ny=172, nc=3,
                           target_transform=CentralCrop((132, 132)))
    test_dataset = Circles(100, nx=172, ny=172, nc=3,
                           target_transform=CentralCrop((132, 132)), seed=1)
    train_loader = DataLoader(train_dataset, batch_size=8)
    test_loader = DataLoader(test_dataset, batch_size=8)

    model = ImageSegmentation(Unet(nx=172, ny=172, channels=3, num_classes=2))
    trainer = Trainer(network=model, loss_fn=model.loss_fn,
                      optimizer=optimizers.Adam(1e-3), metrics=Accuracy())
    trainer.train(n_epoch=10, train_dataset=train_loader,
                  test_dataset=test_loader, print_freq=1)
    trainer.save_weights("./demo/image_segmentation/Unet.npz")
