"""CIFAR-10 DCGAN demo (reference demo/gan/train.py — the per-backend
GANTrainer loops are replaced by one jitted alternating D/G step)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))
import numpy as np

from tlxcv_tpu.data import Cifar10, DataLoader
from tlxcv_tpu.data.transforms import Compose, Normalize, Resize, ToTensor
from tlxcv_tpu.models.gan import DCGANModel
from tlxcv_tpu.tasks import GAN
from tlxcv_tpu.train.gan_trainer import GANTrainer
from tlxcv_tpu.train import optimizers

if __name__ == "__main__":
    transform = Compose([
        Resize((64, 64)),
        Normalize(mean=(127.5,) * 3, std=(127.5,) * 3),
        ToTensor(),
    ])
    train_dataset = Cifar10(root="./data/cifar10", split="train",
                            transform=transform)
    train_dataloader = DataLoader(train_dataset, batch_size=64, shuffle=True,
                                  drop_last=True)

    backbone = DCGANModel(
        generator={"input_nz": 100, "input_nc": 3, "output_nc": 3, "ngf": 64},
        discriminator={"input_nc": 3, "ndf": 64})
    model = GAN(backbone)

    trainer = GANTrainer(model.backbone,
                         optimizer_g=optimizers.Adam(2e-4, beta_1=0.5),
                         optimizer_d=optimizers.Adam(2e-4, beta_1=0.5))
    # Periodic FID validation (the reference configs' `validate:` block;
    # reference gan/configs/cyclegan_horse2zebra.yaml:126)
    from tlxcv_tpu.train import GanValidator

    validator = GanValidator(metrics={"fid": {"name": "FID", "batch_size": 32}})
    val_dataset = Cifar10(root="./data/cifar10", split="test",
                          transform=transform)
    val_loader = DataLoader(val_dataset, batch_size=64, drop_last=True)
    trainer.train(n_epoch=25, train_dataset=train_dataloader, print_freq=1,
                  val_dataset=val_loader, validator=validator,
                  val_max_batches=8)
    print("validation:", trainer.val_results)
    trainer.save_weights("./demo/gan/model.npz")
