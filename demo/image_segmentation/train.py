"""Circles + UNet segmentation demo — the hermetic end-to-end fixture
(reference demo/image_segmentation/train.py)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))
import numpy as np

from tlxcv_tpu.data import Circles, DataLoader
from tlxcv_tpu.models.segmentation import Unet
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
    train_dataset = Circles(1000, nx=172, ny=172,
                            target_transform=CentralCrop((132, 132)))
    train_dataloader = DataLoader(train_dataset, batch_size=2)
    test_dataset = Circles(100, nx=172, ny=172,
                           target_transform=CentralCrop((132, 132)))
    test_dataloader = DataLoader(test_dataset, batch_size=2)

    backbone = Unet(nx=172, ny=172, channels=1, num_classes=2)
    model = ImageSegmentation(backbone)

    trainer = Trainer(
        network=model,
        loss_fn=model.loss_fn,
        optimizer=optimizers.Adam(1e-3),
        metrics=Accuracy(),
    )
    trainer.train(n_epoch=5, train_dataset=train_dataloader,
                  test_dataset=test_dataloader, print_freq=1)
    trainer.save_weights("./demo/image_segmentation/model.npz")
