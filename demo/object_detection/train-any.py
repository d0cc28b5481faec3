"""Train ANY registered detector by name — the registry-driven driver
for the detection zoo beyond the reference's four per-model scripts
(train-YOLOv3/SSD/Detr/ppyoloe.py mirror the reference demo layer;
this one covers yolox_*, fcos_r50, fcos_dcn_r50, retinanet, gfl_r50,
tood_r50, faster_rcnn, cascade_rcnn, centernet, ttfnet, picodet_lcnet,
solov2_r50, mask_rcnn, ...).

Usage: python demo/object_detection/train-any.py fcos_r50 [epochs]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))
import numpy as np

from tlxcv_tpu.config import create_model
from tlxcv_tpu.data import CocoDetection, DataLoader
from tlxcv_tpu.data.det_transforms import (DetCompose, DetNormalize,
                                           DetResize, LabelFormatConvert,
                                           PadGTSingle)
from tlxcv_tpu.tasks import ObjectDetection
from tlxcv_tpu.train import Trainer, optimizers

if __name__ == "__main__":
    name = sys.argv[1] if len(sys.argv) > 1 else "fcos_r50"
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 12

    root = "./data/coco"
    transforms = DetCompose([
        LabelFormatConvert(return_segmentation_masks=False),
        DetResize(size=(512, 512)),
        DetNormalize(mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225)),
        PadGTSingle(num_max_boxes=100),
    ])
    train_ds = CocoDetection(
        root=os.path.join(root, "train2017"),
        annotation_file=os.path.join(root, "annotations",
                                     "instances_train2017.json"),
        transforms=transforms, raw_annotations=True)
    loader = DataLoader(train_ds, batch_size=8, shuffle=True, drop_last=True)

    model = ObjectDetection(create_model(name, num_classes=80))
    trainer = Trainer(network=model, loss_fn=model.loss_fn,
                      optimizer=optimizers.Adam(1e-4))
    trainer.train(n_epoch=epochs, train_dataset=loader, print_freq=1)
    trainer.save_weights(f"./demo/object_detection/{name}.npz")
