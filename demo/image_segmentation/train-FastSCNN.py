"""Circles + FastSCNN segmentation training
(reference demo/image_segmentation/train-FastSCNN.py — the hermetic
per-model variant)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))
import numpy as np

from tlxcv_tpu.models.segmentation import FastSCNN
from tlxcv_tpu.data import Circles, DataLoader
from tlxcv_tpu.tasks.image_segmentation import Accuracy, ImageSegmentation
from tlxcv_tpu.train import Trainer, optimizers



if __name__ == "__main__":
    train_dataset = Circles(1000, nx=64, ny=64, nc=3)
    test_dataset = Circles(100, nx=64, ny=64, nc=3, seed=1)
    train_loader = DataLoader(train_dataset, batch_size=8)
    test_loader = DataLoader(test_dataset, batch_size=8)

    model = ImageSegmentation(FastSCNN(num_classes=2))
    trainer = Trainer(network=model, loss_fn=model.loss_fn,
                      optimizer=optimizers.Adam(1e-3), metrics=Accuracy())
    trainer.train(n_epoch=10, train_dataset=train_loader,
                  test_dataset=test_loader, print_freq=1)
    trainer.save_weights("./demo/image_segmentation/FastSCNN.npz")
