"""300-W + PFLD demo (reference demo/facial_landmark_detection/train.py)
with the full reference transform pipeline: crop to landmarks, resize,
mirror-indexed flip, rotate, occlude, euler-angle GT (PnP) — so the
PFLD euler-weighted auxiliary loss trains on real pose targets."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))
import numpy as np

from tlxcv_tpu.data import DataLoader, Face300W
from tlxcv_tpu.data.landmark_transforms import (CalculateEulerAngles, Crop,
                                                LandmarkCompose,
                                                LandmarkNormalize,
                                                LandmarkResize,
                                                RandomHorizontalFlip,
                                                RandomOcclude, RandomRotate,
                                                ToTuple)
from tlxcv_tpu.models.facial_landmark_detection import PFLD
from tlxcv_tpu.tasks import NME, FacialLandmarkDetection
from tlxcv_tpu.train import Trainer, optimizers


class FlattenLandmarks:
    """(112, 2) landmark grid -> the PFLD 136-vector target."""

    def __call__(self, data):
        image, (lm, euler) = data
        return image, (lm.reshape(-1).astype(np.float32), euler)


if __name__ == "__main__":
    transforms = LandmarkCompose([
        Crop(),
        LandmarkResize(size=(112, 112)),
        RandomHorizontalFlip(),
        RandomRotate(angle_range=list(range(-30, 31, 5))),
        RandomOcclude(occlude_size=(50, 50)),
        CalculateEulerAngles(),
        LandmarkNormalize(),
        ToTuple(),
        FlattenLandmarks(),
    ])
    train_dataset = Face300W(root="./data/300W", split="train",
                             transforms=transforms)
    train_dataloader = DataLoader(train_dataset, batch_size=32, shuffle=True)

    model = FacialLandmarkDetection(PFLD())
    trainer = Trainer(network=model, loss_fn=model.loss_fn,
                      optimizer=optimizers.Adam(1e-4), metrics=NME())
    trainer.train(n_epoch=100, train_dataset=train_dataloader, print_freq=1)
    trainer.save_weights("./demo/facial_landmark_detection/model.npz")
