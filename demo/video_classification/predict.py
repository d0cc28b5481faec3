"""I3D video-clip prediction (reference demo/video_classification/predict.py)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))
import numpy as np

from tlxcv_tpu.models.video_classification import InceptionI3d
from tlxcv_tpu.tasks import VideoClassification
from tlxcv_tpu.train import Trainer

if __name__ == "__main__":
    from tlxcv_tpu.data import Charades

    ds = Charades(root="./data/charades/frames",
                  csv_file="./data/charades/Charades_v1_test.csv",
                  num_frames=32)
    clip, _ = ds[0]

    model = VideoClassification(InceptionI3d(num_classes=157))
    model.load_weights("./demo/video_classification/model.npz")
    trainer = Trainer(network=model)
    logits = np.asarray(trainer.predict(clip[None]))
    # per-frame argmax (reference tasks/video_classification.py predict)
    pred = logits.argmax(-1)[0]
    print("top action ids per temporal step:", pred[:16], "...")
