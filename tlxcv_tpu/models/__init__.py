"""Model zoo re-exports (mirrors reference tlxcv/models/__init__.py:1-7)."""
from . import backbones, classification, detection, face_recognition, \
    facial_landmark_detection, gan, human_pose_estimation, ocr, \
    segmentation, video_classification
from .classification import *  # noqa: F401,F403
from .detection import YOLOv3, SSD, ppyoloe
from .detection.detr import Detr, detr_resnet50
from .face_recognition import ArcFace, RetinaFace
from .facial_landmark_detection import PFLD
from .gan import CycleGANModel, DCGANModel
from .human_pose_estimation import PoseHighResolutionNet
from .ocr import TrOCR
from .segmentation import (BiSeNetV2, ENCNet, ENet, FastFCN, FastSCNN, Unet,
                           deeplabv3, deeplabv3p, fastfcn)
from .video_classification import InceptionI3d
