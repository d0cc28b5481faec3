"""CIFAR-10 classification demo — source-compatible rebuild of
reference demo/image_classification/train.py (no TL_BACKEND switch:
one backend, NHWC)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))
from tlxcv_tpu.data import Cifar10, DataLoader
from tlxcv_tpu.data.transforms import Compose, Normalize, Resize, ToTensor
from tlxcv_tpu.models import vgg11
from tlxcv_tpu.tasks import ImageClassification
from tlxcv_tpu.train import Trainer, optimizers
from tlxcv_tpu.utils import Accuracy

if __name__ == "__main__":
    transform = Compose([
        Resize((224, 224)),
        Normalize(mean=(125.31, 122.95, 113.86), std=(62.99, 62.09, 66.70)),
        ToTensor(),
    ])
    train_dataset = Cifar10(root="./data/cifar10", split="train",
                            transform=transform)
    train_dataloader = DataLoader(train_dataset, batch_size=32, shuffle=True)
    test_dataset = Cifar10(root="./data/cifar10", split="test",
                           transform=transform)
    test_dataloader = DataLoader(test_dataset, batch_size=32)

    backbone = vgg11(batch_norm=True, num_classes=10)
    model = ImageClassification(backbone)

    trainer = Trainer(
        network=model,
        loss_fn=model.loss_fn,
        optimizer=optimizers.Adam(0.0001),
        metrics=Accuracy(),
    )
    trainer.train(n_epoch=100, train_dataset=train_dataloader,
                  test_dataset=test_dataloader, print_freq=1)
    trainer.save_weights("./demo/image_classification/model.npz")
