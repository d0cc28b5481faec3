from .arcface import ArcFace, ArcHead, NormHead
from .retinaface import RetinaFace, multi_box_loss
