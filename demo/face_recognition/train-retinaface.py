"""WIDER-Face + RetinaFace detection training (reference
demo/face_recognition/train.py — the reference splits face DETECTION
training into train.py and recognition into train_rec.py; here the
recognition recipe lives in train.py and this script is the detection
side: Wider -> resize/normalize -> host Encoder (GT-anchor matching +
delta encoding, tasks/face_recognition.py) -> MultiBoxLoss)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))
import numpy as np

from tlxcv_tpu.data import DataLoader, Wider
from tlxcv_tpu.models.face_recognition import RetinaFace
from tlxcv_tpu.tasks.face_recognition import Encoder, prior_box
from tlxcv_tpu.train import Trainer, optimizers

INPUT_SIZE = 640


class RetinaFaceTrainTransform:
    """Resize + normalize the image; encode targets to per-prior rows
    (the reference RetinaFaceTransform.encode path)."""

    def __init__(self, input_size=INPUT_SIZE):
        self.encoder = Encoder(prior_box((input_size, input_size)))
        self.input_size = input_size

    def __call__(self, image, target):
        import cv2

        img = cv2.resize(image, (self.input_size, self.input_size))
        img = (img.astype(np.float32) - 127.5) / 128.0
        return img, self.encoder(target)


if __name__ == "__main__":
    train_dataset = Wider(root="./data/WIDER", split="train",
                          transforms=RetinaFaceTrainTransform())
    train_dataloader = DataLoader(train_dataset, batch_size=8, shuffle=True)

    model = RetinaFace(input_size=INPUT_SIZE)
    trainer = Trainer(network=model, loss_fn=model.loss_fn,
                      optimizer=optimizers.SGD(1e-3, momentum=0.9,
                                               weight_decay=5e-4))
    trainer.train(n_epoch=100, train_dataset=train_dataloader, print_freq=1)
    trainer.save_weights("./demo/face_recognition/retinaface.npz")
