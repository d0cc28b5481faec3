"""YOLOv3 predict (reference demo/object_detection/predict-YOLOv3.py):
the whole backbone+decode+NMS path is one jit."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))
import numpy as np

from tlxcv_tpu.models import YOLOv3
from tlxcv_tpu.tasks import ObjectDetection
from tlxcv_tpu.train import Trainer

if __name__ == "__main__":
    import cv2

    image = cv2.cvtColor(cv2.imread("./demo/object_detection/cats.jpg"),
                         cv2.COLOR_BGR2RGB)
    x = cv2.resize(image, (416, 416)).astype(np.float32)[None] / 255.0

    model = ObjectDetection(YOLOv3(num_classes=80))
    model.load_weights("./demo/object_detection/yolov3.npz")
    trainer = Trainer(network=model)
    dets, counts = trainer.predict(x)
    dets, n = np.asarray(dets)[0], int(np.asarray(counts)[0])
    for label, score, x1, y1, x2, y2 in dets[:n]:
        print(f"class {int(label)} score {score:.3f} "
              f"box ({x1:.0f},{y1:.0f},{x2:.0f},{y2:.0f})")
