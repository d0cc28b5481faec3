"""COCO object detection demo (reference demo/object_detection/train.py,
minus the TL_BACKEND switch and host-side target loops).

Targets are padded tensors (PadGTSingle equivalent); assignment runs
on device inside the jitted loss.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))
import numpy as np

from tlxcv_tpu.data import CocoDetection, DataLoader
from tlxcv_tpu.models import YOLOv3
from tlxcv_tpu.tasks import ObjectDetection
from tlxcv_tpu.train import Trainer, optimizers

INPUT_SIZE = 416
NUM_MAX_BOXES = 50  # reference PadGTSingle(num_max_boxes=200) scaled down


class DetTransform:
    """Resize + normalize image; normalize boxes to cxcywh; pad GT."""

    def __call__(self, image, target):
        import cv2

        h, w = image.shape[:2]
        img = cv2.resize(image, (INPUT_SIZE, INPUT_SIZE)).astype(np.float32)
        img = img / 255.0
        boxes = np.asarray(target["boxes"], np.float32).reshape(-1, 4)
        boxes = boxes / [w, h, w, h]
        cxcywh = np.concatenate([(boxes[:, :2] + boxes[:, 2:]) / 2,
                                 boxes[:, 2:] - boxes[:, :2]], -1)
        n = min(len(cxcywh), NUM_MAX_BOXES)
        out_boxes = np.zeros((NUM_MAX_BOXES, 4), np.float32)
        out_cls = np.zeros((NUM_MAX_BOXES,), np.int32)
        out_boxes[:n] = cxcywh[:n]
        out_cls[:n] = np.asarray(target["class_labels"])[:n]
        return img, {"boxes": out_boxes, "class_labels": out_cls}


if __name__ == "__main__":
    train_dataset = CocoDetection(
        root="./data/coco/train2017",
        annotation_file="./data/coco/annotations/instances_train2017.json",
        transforms=DetTransform())
    train_dataloader = DataLoader(train_dataset, batch_size=8, shuffle=True,
                                  drop_last=True)

    backbone = YOLOv3(num_classes=80)
    model = ObjectDetection(backbone)

    trainer = Trainer(network=model, loss_fn=model.loss_fn,
                      optimizer=optimizers.Adam(1e-4, grad_clip=10.0))
    trainer.train(n_epoch=50, train_dataset=train_dataloader, print_freq=1)
    trainer.save_weights("./demo/object_detection/model.npz")
