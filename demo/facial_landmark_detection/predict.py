"""PFLD landmark predict + draw
(reference demo/facial_landmark_detection/predict.py)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))
import numpy as np

from tlxcv_tpu.models.facial_landmark_detection import PFLD
from tlxcv_tpu.tasks import FacialLandmarkDetection
from tlxcv_tpu.tasks.facial_landmark_detection import draw_landmarks
from tlxcv_tpu.train import Trainer

if __name__ == "__main__":
    import cv2

    image = cv2.cvtColor(
        cv2.imread("./demo/facial_landmark_detection/face.jpg"),
        cv2.COLOR_BGR2RGB)
    x = cv2.resize(image, (112, 112)).astype(np.float32)[None] / 255.0

    model = FacialLandmarkDetection(PFLD())
    model.load_weights("./demo/facial_landmark_detection/model.npz")
    trainer = Trainer(network=model)
    landmarks, _ = trainer.predict(x)
    lm = np.asarray(landmarks)[0].reshape(-1, 2)  # normalized
    lm_px = lm * [image.shape[1], image.shape[0]]
    out = draw_landmarks(image.copy(), lm_px)
    cv2.imwrite("./demo/facial_landmark_detection/pred.jpg",
                cv2.cvtColor(out, cv2.COLOR_RGB2BGR))
    print("landmarks:", lm_px[:5].round(1), "...")
