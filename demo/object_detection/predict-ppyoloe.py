"""PPYOLOE predict (reference demo/object_detection/predict-ppyoloe.py)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))
import numpy as np

from tlxcv_tpu.models.detection import ppyoloe
from tlxcv_tpu.tasks import ObjectDetection
from tlxcv_tpu.train import Trainer

if __name__ == "__main__":
    import cv2

    image = cv2.cvtColor(cv2.imread("./demo/object_detection/cats.jpg"),
                         cv2.COLOR_BGR2RGB)
    x = cv2.resize(image, (640, 640)).astype(np.float32)[None]
    x = (x / 255.0 - (0.485, 0.456, 0.406)) / (0.229, 0.224, 0.225)

    model = ObjectDetection(ppyoloe("ppyoloe_l", num_classes=80))
    model.load_weights("./demo/object_detection/ppyoloe_l.npz")
    trainer = Trainer(network=model)
    dets, counts = trainer.predict(x.astype(np.float32))
    dets, n = np.asarray(dets)[0], int(np.asarray(counts)[0])
    for label, score, x1, y1, x2, y2 in dets[:n]:
        print(f"class {int(label)} score {score:.3f} "
              f"box ({x1:.0f},{y1:.0f},{x2:.0f},{y2:.0f})")
