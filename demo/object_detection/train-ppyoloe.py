"""COCO + PPYOLOE-l training (reference demo/object_detection/train-ppyoloe.py).

PPYOLOE's on-device ATSS/TaskAligned assigners consume pixel-space xyxy
GT + pad mask; the Trainer threads the bucketed epoch through so the
assigner switch at static_assigner_epoch engages.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))
import numpy as np

from tlxcv_tpu.data import CocoDetection, DataLoader
from tlxcv_tpu.data.det_transforms import (DetCompose, DetNormalize,
                                           DetResize, LabelFormatConvert,
                                           PadGTSingle,
                                           center_to_corners_format)
from tlxcv_tpu.models.detection import ppyoloe
from tlxcv_tpu.tasks import ObjectDetection
from tlxcv_tpu.train import Trainer, optimizers

INPUT_SIZE = 640


class BoxesToPixelXYXY:
    """normalized cxcywh (DetNormalize output) -> pixel xyxy (PPYOLOE)."""

    def __call__(self, data):
        im, sample = data
        boxes = center_to_corners_format(sample["boxes"]) * INPUT_SIZE
        sample = dict(sample, boxes=boxes.astype(np.float32))
        return im, sample


if __name__ == "__main__":
    transforms = DetCompose([
        LabelFormatConvert(return_segmentation_masks=False),
        DetResize(size=(INPUT_SIZE, INPUT_SIZE)),
        DetNormalize(mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225)),
        PadGTSingle(num_max_boxes=200),
        BoxesToPixelXYXY(),
    ])
    train_dataset = CocoDetection(
        root="./data/coco/train2017",
        annotation_file="./data/coco/annotations/instances_train2017.json",
        transforms=transforms, raw_annotations=True)
    train_dataloader = DataLoader(train_dataset, batch_size=8, shuffle=True,
                                  drop_last=True)

    model = ObjectDetection(ppyoloe("ppyoloe_l", num_classes=80))
    trainer = Trainer(network=model, loss_fn=model.loss_fn,
                      optimizer=optimizers.Adam(1e-4, grad_clip=35.0))
    trainer.train(n_epoch=80, train_dataset=train_dataloader, print_freq=1)
    trainer.save_weights("./demo/object_detection/ppyoloe_l.npz")
