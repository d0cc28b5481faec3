"""COCO + SSD-MobileNetV1 training
(reference demo/object_detection/train-SSD.py).  SSD matching runs on
device; GT arrives as normalized xyxy + pad mask."""
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
from tlxcv_tpu.models.detection import SSD
from tlxcv_tpu.tasks import ObjectDetection
from tlxcv_tpu.train import Trainer, optimizers


class BoxesToXYXY:
    def __call__(self, data):
        im, sample = data
        sample = dict(sample)
        sample["boxes"] = center_to_corners_format(
            sample["boxes"]).astype(np.float32)
        sample["mask"] = sample.pop("pad_gt_mask")
        return im, sample


if __name__ == "__main__":
    transforms = DetCompose([
        LabelFormatConvert(return_segmentation_masks=False),
        DetResize(size=(300, 300)),
        DetNormalize(mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225)),
        PadGTSingle(num_max_boxes=100),
        BoxesToXYXY(),
    ])
    train_dataset = CocoDetection(
        root="./data/coco/train2017",
        annotation_file="./data/coco/annotations/instances_train2017.json",
        transforms=transforms, raw_annotations=True)
    train_dataloader = DataLoader(train_dataset, batch_size=16, shuffle=True,
                                  drop_last=True)

    model = ObjectDetection(SSD(num_classes=80, image_size=(300, 300)))
    trainer = Trainer(network=model, loss_fn=model.loss_fn,
                      optimizer=optimizers.Adam(1e-4))
    trainer.train(n_epoch=60, train_dataset=train_dataloader, print_freq=1)
    trainer.save_weights("./demo/object_detection/ssd.npz")
