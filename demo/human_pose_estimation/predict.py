"""Pose predict: heatmaps -> keypoints -> drawn image
(reference demo/human_pose_estimation/predict.py inference path)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))
import numpy as np

from tlxcv_tpu.models.human_pose_estimation import pose_hrnet_w32
from tlxcv_tpu.tasks import HumanPoseEstimation
from tlxcv_tpu.tasks.human_pose_estimation import get_max_preds
from tlxcv_tpu.train import Trainer

if __name__ == "__main__":
    import cv2

    image = cv2.cvtColor(cv2.imread(
        "./demo/human_pose_estimation/person.jpg"), cv2.COLOR_BGR2RGB)
    h, w = image.shape[:2]
    x = cv2.resize(image, (256, 256)).astype(np.float32)[None] / 255.0

    model = HumanPoseEstimation(pose_hrnet_w32(num_joints=17))
    model.load_weights("./demo/human_pose_estimation/model.npz")
    trainer = Trainer(network=model)
    heatmaps = np.asarray(trainer.predict(x))
    pts, conf = get_max_preds(heatmaps)
    hh, hw = heatmaps.shape[1:3]
    kpts = (pts[0] / (hw, hh) * (w, h)).astype(int)
    for xk, yk in kpts:
        cv2.circle(image, (xk, yk), 3, (0, 255, 0), -1)
    cv2.imwrite("./demo/human_pose_estimation/pose_out.jpg",
                cv2.cvtColor(image, cv2.COLOR_RGB2BGR))
    print("keypoints:", kpts.tolist())
