"""COCO + DETR training (reference demo/object_detection/train-Detr.py).
Hungarian matching runs per batch inside the jitted loss (host callback
or on-device auction, ops/hungarian.py)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))
from tlxcv_tpu.data import CocoDetection, DataLoader
from tlxcv_tpu.data.det_transforms import (DetCompose, DetNormalize,
                                           DetResize, LabelFormatConvert,
                                           PadGTSingle)
from tlxcv_tpu.models.detection import Detr
from tlxcv_tpu.tasks import ObjectDetection
from tlxcv_tpu.train import Trainer, optimizers

if __name__ == "__main__":
    transforms = DetCompose([
        LabelFormatConvert(return_segmentation_masks=False),
        DetResize(size=(512, 512)),
        DetNormalize(mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225)),
        PadGTSingle(num_max_boxes=100),
    ])
    train_dataset = CocoDetection(
        root="./data/coco/train2017",
        annotation_file="./data/coco/annotations/instances_train2017.json",
        transforms=transforms, raw_annotations=True)
    train_dataloader = DataLoader(train_dataset, batch_size=8, shuffle=True,
                                  drop_last=True)

    model = ObjectDetection(Detr(num_classes=91))
    trainer = Trainer(network=model, loss_fn=model.loss_fn,
                      optimizer=optimizers.AdamW(1e-4, weight_decay=1e-4))
    trainer.train(n_epoch=300, train_dataset=train_dataloader, print_freq=1)
    trainer.save_weights("./demo/object_detection/detr.npz")
