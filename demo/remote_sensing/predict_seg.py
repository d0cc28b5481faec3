"""RS segmentation predict (reference tlxcv/models/rs/seg/predict_rsseg.py)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))
import numpy as np

from tlxcv_tpu.models import rs
from tlxcv_tpu.train import Trainer

if __name__ == "__main__":
    import cv2

    image = cv2.cvtColor(cv2.imread("./demo/remote_sensing/scene.png"),
                         cv2.COLOR_BGR2RGB)
    x = cv2.resize(image, (256, 256)).astype(np.float32)[None] / 255.0

    model = rs.FarSeg(num_classes=5, backbone_depth=50)
    model.load_weights("./demo/remote_sensing/farseg.npz")
    trainer = Trainer(network=model)
    logits = np.asarray(trainer.predict(x))
    pred = logits.argmax(-1)[0].astype(np.uint8)
    cv2.imwrite("./demo/remote_sensing/seg_pred.png", pred * 50)
    print("classes present:", np.unique(pred))
