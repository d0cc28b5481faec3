"""RetinaFace detection + ArcFace embedding predict
(reference demo/face_recognition/{predict.py, predict_rec.py})."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))
import numpy as np

from tlxcv_tpu.models.face_recognition import ArcFace, RetinaFace
from tlxcv_tpu.tasks.face_recognition import detect_faces
from tlxcv_tpu.train import Trainer

if __name__ == "__main__":
    import cv2

    image = cv2.cvtColor(cv2.imread("./demo/face_recognition/face.jpg"),
                         cv2.COLOR_BGR2RGB)

    det = RetinaFace(input_size=640)
    det.load_weights("./demo/face_recognition/retinaface.npz")
    boxes = detect_faces(image, det)
    print(f"{len(boxes)} face(s)")

    rec = ArcFace(num_classes=0)  # embedding head
    rec.load_weights("./demo/face_recognition/arcface.npz")
    trainer = Trainer(network=rec)
    for x1, y1, x2, y2 in boxes.astype(int):
        crop = cv2.resize(image[y1:y2, x1:x2], (112, 112))
        crop = (crop.astype(np.float32) - 127.5) / 128.0
        emb = np.asarray(trainer.predict(crop[None]))[0]
        print("face", (x1, y1, x2, y2), "embedding norm",
              float(np.linalg.norm(emb)))
