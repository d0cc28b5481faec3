"""COCO + YOLOv3 training (reference demo/object_detection/train-YOLOv3.py)
using the public detection transform pipeline: LabelFormatConvert ->
DetResize -> DetNormalize -> PadGTSingle (static shapes; assignment runs
on device inside the jitted loss)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))
from tlxcv_tpu.data import CocoDetection, DataLoader
from tlxcv_tpu.data.det_transforms import (DetCompose, DetNormalize,
                                           DetResize, LabelFormatConvert,
                                           PadGTSingle)
from tlxcv_tpu.models import YOLOv3
from tlxcv_tpu.tasks import ObjectDetection
from tlxcv_tpu.train import Trainer, optimizers

if __name__ == "__main__":
    transforms = DetCompose([
        LabelFormatConvert(return_segmentation_masks=False),
        DetResize(size=(416, 416)),
        DetNormalize(mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225)),
        PadGTSingle(num_max_boxes=50),
    ])
    train_dataset = CocoDetection(
        root="./data/coco/train2017",
        annotation_file="./data/coco/annotations/instances_train2017.json",
        transforms=transforms, raw_annotations=True)
    train_dataloader = DataLoader(train_dataset, batch_size=8, shuffle=True,
                                  drop_last=True)

    model = ObjectDetection(YOLOv3(num_classes=80))
    trainer = Trainer(network=model, loss_fn=model.loss_fn,
                      optimizer=optimizers.Adam(1e-4, grad_clip=10.0))
    trainer.train(n_epoch=50, train_dataset=train_dataloader, print_freq=1)
    trainer.save_weights("./demo/object_detection/yolov3.npz")
