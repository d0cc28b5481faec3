"""StyleGANv2 FFHQ training (configs/gan/stylegan_v2_256_ffhq.yaml
semantics: logistic loss, lazy R1 + path-length regularization)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))
import glob

import numpy as np

from tlxcv_tpu.config import build_gan_trainer
from tlxcv_tpu.data import DataLoader


class ImageFolder:
    def __init__(self, root, size=256):
        self.paths = sorted(glob.glob(os.path.join(root, "*.png")) +
                            glob.glob(os.path.join(root, "*.jpg")))
        self.size = size

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, i):
        import cv2

        img = cv2.cvtColor(cv2.imread(self.paths[i]), cv2.COLOR_BGR2RGB)
        img = cv2.resize(img, (self.size, self.size)).astype(np.float32)
        if np.random.random() < 0.5:
            img = img[:, ::-1]
        return (img - 127.5) / 127.5


if __name__ == "__main__":
    (g, d), trainer = build_gan_trainer("./configs/gan/stylegan_v2_256_ffhq.yaml")
    dataset = ImageFolder("./data/ffhq/images256x256")
    loader = DataLoader(dataset, batch_size=4, shuffle=True, drop_last=True)
    trainer.train(n_epoch=100, train_dataset=loader, print_freq=1)
    trainer.save_weights("./demo/gan/styleganv2.npz")
