"""LeViT distillation-aware training demo (DeiT recipe): the student's
class head learns CIFAR labels while its distillation head learns a
frozen teacher's predictions — the teacher runs OUTSIDE the train graph
(tasks/distillation.teacher_labels).

Reference ships the distillation-head architectures
(tlxcv/models/classification/levit.py head_dist,
distilled_vision_transformer.py); this demo completes the training
recipe for them.  Swap `levit_128s` for `deit_tiny` for the DeiT
variant.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))
from tlxcv_tpu.data import Cifar10, DataLoader
from tlxcv_tpu.data.transforms import Compose, Normalize, Resize, ToTensor
from tlxcv_tpu.models import resnet18
from tlxcv_tpu.models.classification import levit_128s
from tlxcv_tpu.tasks import (DistilledClassification, ImageClassification,
                             teacher_labels)
from tlxcv_tpu.train import Trainer, optimizers
from tlxcv_tpu.utils import Accuracy


class DistillLoader:
    """Re-iterable (x, {"label", "teacher"}) stream: the frozen teacher's
    jitted forward labels every batch on the fly."""

    def __init__(self, teacher, loader):
        from tlxcv_tpu.core import split

        self.teacher, self.loader = teacher, loader
        self.params, self.state = split(teacher)

    def __iter__(self):
        return iter(teacher_labels(self.teacher, self.loader,
                                   self.params, self.state))


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

    # 1) teacher: any trained classifier (load real weights in practice)
    teacher = ImageClassification(resnet18(num_classes=10))
    # teacher.load_weights("./demo/image_classification/teacher.npz")

    # 2) student: LeViT with its distillation head enabled
    student = levit_128s(num_classes=10, distillation=True)
    task = DistilledClassification(student, hard=True)

    trainer = Trainer(
        network=task,
        loss_fn=task.loss_fn,
        optimizer=optimizers.Adam(0.0005),
        metrics=None,
    )
    trainer.train(n_epoch=100,
                  train_dataset=DistillLoader(teacher, train_dataloader),
                  print_freq=1)
    trainer.save_weights("./demo/image_classification/levit_distill.npz")
