"""COCO keypoints + pose HRNet demo
(reference demo/human_pose_estimation/train.py — no device_info() shelling
to *-smi tools; use tlxcv_tpu.utils.profiler for introspection)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))
import numpy as np

from tlxcv_tpu.data import CocoHumanPoseEstimation, DataLoader
from tlxcv_tpu.models.human_pose_estimation import pose_hrnet_w32
from tlxcv_tpu.tasks import PCK, GenerateTarget, HumanPoseEstimation
from tlxcv_tpu.train import Trainer, optimizers


class PoseTransform:
    def __init__(self, size=(256, 256)):
        self.size = size
        self.gen = GenerateTarget(size=size)

    def __call__(self, image, target):
        import cv2

        x, y, w, h = target["bbox"]
        crop = image[int(y):int(y + h) or 1, int(x):int(x + w) or 1]
        img = cv2.resize(crop, self.size[::-1]).astype(np.float32) / 255.0
        kpts = np.asarray(target["keypoints"], np.float32).copy()
        kpts[:, 0] = (kpts[:, 0] - x) * self.size[1] / max(w, 1)
        kpts[:, 1] = (kpts[:, 1] - y) * self.size[0] / max(h, 1)
        _, label = self.gen((img, kpts))
        return img, label


if __name__ == "__main__":
    train_dataset = CocoHumanPoseEstimation(
        root="./data/coco/train2017",
        annotation_file="./data/coco/annotations/person_keypoints_train2017.json",
        transforms=PoseTransform())
    train_dataloader = DataLoader(train_dataset, batch_size=16, shuffle=True,
                                  drop_last=True)

    model = HumanPoseEstimation(pose_hrnet_w32(num_joints=17))
    trainer = Trainer(network=model, loss_fn=model.loss_fn,
                      optimizer=optimizers.Adam(1e-3), metrics=PCK())
    trainer.train(n_epoch=20, train_dataset=train_dataloader, print_freq=1)
    trainer.save_weights("./demo/human_pose_estimation/model.npz")
