"""UNet + Circles hermetic segmentation slice (reference demo/image_segmentation)."""
import numpy as np

from tlxcv_tpu.data import Circles, DataLoader
from tlxcv_tpu.models.segmentation import Unet
from tlxcv_tpu.tasks.image_segmentation import Accuracy, ImageSegmentation
from tlxcv_tpu.train import Trainer, optimizers


class CentralCrop:
    def __init__(self, size):
        self.size = size

    def __call__(self, x):
        h, w = self.size
        hd = (x.shape[0] - h) // 2
        wd = (x.shape[1] - w) // 2
        return np.ascontiguousarray(x[hd:hd + h, wd:wd + w])


def test_unet_valid_padding_geometry():
    m = Unet(nx=92, ny=92, channels=1, num_classes=2, filters_root=8)
    out = m(np.zeros((1, 92, 92, 1), np.float32))
    assert out.shape == (1, 52, 52, 2)  # nx - 40 for depth-3 valid UNet


def test_unet_circles_learns():
    ds = Circles(32, nx=92, ny=92, seed=1,
                 target_transform=CentralCrop((52, 52)))
    loader = DataLoader(ds, batch_size=8)
    model = ImageSegmentation(Unet(nx=92, ny=92, channels=1, num_classes=2,
                                   filters_root=16, dropout_rate=0.0))
    trainer = Trainer(network=model, optimizer=optimizers.Adam(1e-3),
                      metrics=Accuracy())
    trainer.train(n_epoch=20, train_dataset=loader, print_freq=100)
    res = trainer.evaluate(loader)
    # circles cover a small fraction; accuracy must clearly beat majority class
    assert res["metric"] > 0.85, res
