"""DCGAN sample generation (reference demo/gan/predict.py)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))
import jax
import numpy as np

from tlxcv_tpu.core import pure, split
from tlxcv_tpu.models.gan import DCGANModel

if __name__ == "__main__":
    backbone = DCGANModel(
        generator={"input_nz": 100, "input_nc": 3, "output_nc": 3, "ngf": 64},
        discriminator={"input_nc": 3, "ndf": 64})
    backbone.load_weights("./demo/gan/model.npz")
    gen = backbone.netG
    params, state = split(gen)
    z = jax.random.normal(jax.random.key(0), (16, 1, 1, 100))
    imgs, _ = pure(gen)(params, state, z)
    imgs = np.asarray((imgs + 1) * 127.5).clip(0, 255).astype(np.uint8)

    import cv2

    grid = np.concatenate(
        [np.concatenate(list(imgs[i * 4:(i + 1) * 4]), axis=1)
         for i in range(4)], axis=0)
    cv2.imwrite("./demo/gan/samples.png", cv2.cvtColor(grid,
                                                       cv2.COLOR_RGB2BGR))
    print("wrote ./demo/gan/samples.png", grid.shape)
