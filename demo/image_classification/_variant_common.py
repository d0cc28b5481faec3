"""Shared flow for the per-architecture classification demo variants
(the reference ships train-/predict-<arch>.py pairs that repeat the
CIFAR-10 recipe verbatim per backbone — here one parameterized flow,
reference demo/image_classification/train-*.py)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))
import numpy as np

from tlxcv_tpu.config import create_model
from tlxcv_tpu.data import Cifar10, DataLoader
from tlxcv_tpu.data.transforms import Compose, Normalize, Resize, ToTensor
from tlxcv_tpu.tasks import ImageClassification
from tlxcv_tpu.train import Trainer, optimizers
from tlxcv_tpu.utils import Accuracy

HERE = os.path.dirname(os.path.abspath(__file__))
TRANSFORM = Compose([
    Resize((224, 224)),
    Normalize(mean=(125.31, 122.95, 113.86), std=(62.99, 62.09, 66.70)),
    ToTensor(),
])


def _weights_path(model_name):
    return os.path.join(HERE, f"model-{model_name}.npz")


def train_classifier(model_name, n_epoch=100, batch_size=32, lr=1e-4, **kw):
    train_ds = Cifar10(root="./data/cifar10", split="train",
                       transform=TRANSFORM)
    test_ds = Cifar10(root="./data/cifar10", split="test",
                      transform=TRANSFORM)
    model = ImageClassification(
        create_model(model_name, num_classes=10, **kw))
    trainer = Trainer(network=model, loss_fn=model.loss_fn,
                      optimizer=optimizers.Adam(lr), metrics=Accuracy())
    trainer.train(n_epoch=n_epoch,
                  train_dataset=DataLoader(train_ds, batch_size=batch_size,
                                           shuffle=True),
                  test_dataset=DataLoader(test_ds, batch_size=batch_size),
                  print_freq=1)
    trainer.save_weights(_weights_path(model_name))
    return trainer


def predict_classifier(model_name, image_path=None, **kw):
    import cv2

    image_path = image_path or os.path.join(HERE, "dog.jpg")
    image = cv2.cvtColor(cv2.imread(image_path), cv2.COLOR_BGR2RGB)
    x = TRANSFORM(image)[None]
    model = ImageClassification(
        create_model(model_name, num_classes=10, **kw))
    model.load_weights(_weights_path(model_name))
    trainer = Trainer(network=model)
    logits = np.asarray(trainer.predict(x))
    print("class:", logits.argmax(-1))
    return logits
