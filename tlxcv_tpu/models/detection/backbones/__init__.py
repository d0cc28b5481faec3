from .darknet import DarkNet, darknet53
