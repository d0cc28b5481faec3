from . import transforms
from .circles import Circles
from .cifar import Cifar10
from .loader import DataLoader, default_collate
from .vision import Dataset, StandardTransform, VisionDataset

__all__ = ["transforms", "Circles", "Cifar10", "DataLoader",
           "default_collate", "Dataset", "StandardTransform", "VisionDataset"]
