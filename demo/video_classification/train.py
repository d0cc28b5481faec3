"""Charades + I3D demo (reference demo/video_classification/train.py)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))
from tlxcv_tpu.data import Charades, DataLoader
from tlxcv_tpu.models.video_classification import InceptionI3d
from tlxcv_tpu.tasks import VideoClassification
from tlxcv_tpu.train import Trainer, optimizers
from tlxcv_tpu.utils import EmptyMetric

if __name__ == "__main__":
    train_dataset = Charades(root="./data/charades/frames",
                             csv_file="./data/charades/Charades_v1_train.csv",
                             num_frames=32)
    train_dataloader = DataLoader(train_dataset, batch_size=4, shuffle=True)

    backbone = InceptionI3d(num_classes=157)
    model = VideoClassification(backbone)

    def loss_fn(output, target):
        # align per-frame labels to the temporally-pooled logits
        import jax.numpy as jnp

        t = output.shape[1]
        idx = jnp.linspace(0, target.shape[1] - 1, t).astype(jnp.int32)
        return model.loss_fn(output, target[:, idx])

    trainer = Trainer(network=model, loss_fn=loss_fn,
                      optimizer=optimizers.Adam(1e-4), metrics=EmptyMetric())
    trainer.train(n_epoch=10, train_dataset=train_dataloader, print_freq=1)
    trainer.save_weights("./demo/video_classification/model.npz")
