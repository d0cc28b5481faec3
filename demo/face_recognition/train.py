"""CASIA-WebFace + ArcFace demo (reference demo/face_recognition/train.py)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))
import numpy as np

from tlxcv_tpu.data import CasiaWebFace, DataLoader
from tlxcv_tpu.models.face_recognition import ArcFace
from tlxcv_tpu.train import Trainer, optimizers
from tlxcv_tpu.utils import Accuracy


class FaceTransform:
    def __call__(self, image, label):
        import cv2

        img = cv2.resize(image, (112, 112)).astype(np.float32)
        return (img - 127.5) / 128.0, label


if __name__ == "__main__":
    train_dataset = CasiaWebFace(root="./data/CASIA-WebFace", split="train",
                                 transforms=FaceTransform())
    train_dataloader = DataLoader(train_dataset, batch_size=64, shuffle=True)

    model = ArcFace(input_size=112, embed_size=512,
                    num_classes=train_dataset.num_classes)

    # network(x) returns normalized embeds; loss applies the arc margin
    trainer = Trainer(network=model, loss_fn=model.loss_fn,
                      optimizer=optimizers.SGD(0.01, momentum=0.9,
                                               weight_decay=5e-4))
    trainer.train(n_epoch=30, train_dataset=train_dataloader, print_freq=1)
    trainer.save_weights("./demo/face_recognition/model.npz")
