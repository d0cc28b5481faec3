"""DETR predict (reference demo/object_detection/predict-Detr.py) using
the public detr_post_process (reference transforms.py :315-369)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))
import numpy as np

from tlxcv_tpu.data.det_transforms import detr_post_process
from tlxcv_tpu.models.detection import Detr
from tlxcv_tpu.tasks import ObjectDetection
from tlxcv_tpu.train import Trainer

if __name__ == "__main__":
    import cv2

    image = cv2.cvtColor(cv2.imread("./demo/object_detection/cats.jpg"),
                         cv2.COLOR_BGR2RGB)
    h, w = image.shape[:2]
    x = cv2.resize(image, (512, 512)).astype(np.float32)[None]
    x = (x / 255.0 - (0.485, 0.456, 0.406)) / (0.229, 0.224, 0.225)

    model = ObjectDetection(Detr(num_classes=91))
    model.load_weights("./demo/object_detection/detr.npz")
    trainer = Trainer(network=model)
    out = trainer.predict(x.astype(np.float32))
    results = detr_post_process(out["logits"], out["boxes"],
                                np.asarray([[h, w]]), top_k=20)
    for r in results:
        for s, l, b in zip(r["scores"], r["labels"], r["boxes"]):
            if s > 0.5:
                print(f"class {int(l)} score {s:.3f} box {b.round(1)}")
