"""LEVIR-CD change-detection training (reference rs/cd usage:
bitemporal pairs -> change mask; mirrors the PaddleRS recipe the
reference models were trained with)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))
import numpy as np

from tlxcv_tpu.data import DataLoader
from tlxcv_tpu.models import rs
from tlxcv_tpu.train import Trainer, optimizers
from tlxcv_tpu.utils import MeanIoU


class LevirCD:
    """LEVIR-CD directory layout: {root}/{split}/{A,B,label}/*.png"""

    def __init__(self, root, split="train", size=256):
        import glob

        self.a = sorted(glob.glob(os.path.join(root, split, "A", "*.png")))
        self.size = size

    def __len__(self):
        return len(self.a)

    def __getitem__(self, i):
        import cv2

        pa = self.a[i]
        pb = pa.replace(os.sep + "A" + os.sep, os.sep + "B" + os.sep)
        pl = pa.replace(os.sep + "A" + os.sep, os.sep + "label" + os.sep)
        s = (self.size, self.size)
        t1 = cv2.resize(cv2.cvtColor(cv2.imread(pa), cv2.COLOR_BGR2RGB), s)
        t2 = cv2.resize(cv2.cvtColor(cv2.imread(pb), cv2.COLOR_BGR2RGB), s)
        lab = cv2.resize(cv2.imread(pl, cv2.IMREAD_GRAYSCALE), s,
                         interpolation=cv2.INTER_NEAREST)
        x = np.concatenate([t1, t2], -1).astype(np.float32) / 255.0
        return x, (lab > 127).astype(np.int32)


class CDWrapper(rs.BIT.__bases__[0]):
    """Adapt model(t1, t2) to the Trainer's model(x) contract by packing
    the bitemporal pair on channels."""

    def __init__(self, cd_model):
        self.cd = cd_model

    def __call__(self, x):
        return self.cd(x[..., :3], x[..., 3:])

    def loss_fn(self, output, target):
        import optax

        return optax.softmax_cross_entropy_with_integer_labels(
            output, target).mean()


if __name__ == "__main__":
    train_dataset = LevirCD("./data/LEVIR-CD", "train")
    train_dataloader = DataLoader(train_dataset, batch_size=8, shuffle=True,
                                  drop_last=True)

    model = CDWrapper(rs.BIT(in_channels=3, num_classes=2))
    trainer = Trainer(network=model, optimizer=optimizers.Adam(1e-4),
                      metrics=MeanIoU(2))
    trainer.train(n_epoch=100, train_dataset=train_dataloader, print_freq=1)
    trainer.save_weights("./demo/remote_sensing/bit.npz")
