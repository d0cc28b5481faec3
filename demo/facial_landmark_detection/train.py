"""300-W + PFLD demo (reference demo/facial_landmark_detection/train.py)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))
import numpy as np

from tlxcv_tpu.data import DataLoader, Face300W
from tlxcv_tpu.models.facial_landmark_detection import PFLD
from tlxcv_tpu.tasks import NME, FacialLandmarkDetection
from tlxcv_tpu.train import Trainer, optimizers


class LandmarkTransform:
    def __call__(self, image, landmarks):
        import cv2

        h, w = image.shape[:2]
        img = cv2.resize(image, (112, 112)).astype(np.float32) / 255.0
        lm = np.asarray(landmarks, np.float32) / [w, h] * 112
        euler = np.zeros((3,), np.float32)
        return img, (lm.reshape(-1), euler)


if __name__ == "__main__":
    train_dataset = Face300W(root="./data/300W", split="train",
                             transforms=LandmarkTransform())
    train_dataloader = DataLoader(train_dataset, batch_size=32, shuffle=True)

    model = FacialLandmarkDetection(PFLD())
    trainer = Trainer(network=model, loss_fn=model.loss_fn,
                      optimizer=optimizers.Adam(1e-4), metrics=NME())
    trainer.train(n_epoch=100, train_dataset=train_dataloader, print_freq=1)
    trainer.save_weights("./demo/facial_landmark_detection/model.npz")
