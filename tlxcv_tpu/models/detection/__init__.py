from .backbones.darknet import DarkNet, darknet53
from .ppyoloe import (CSPResNet, CustomCSPPAN, PPYOLOE, PPYOLOEHead, ppyoloe)
from .ssd import SSD, SSDHead, SSDLoss
from .yolov3 import YOLOv3, YOLOv3FPN, YOLOv3Head, YOLOv3Loss, gt2yolo_targets
from .mask_rcnn import FPN, MaskRCNN, RPNHead
from .detr import Detr, DetrLoss, detr_resnet50
from .fcos import FCOS, FCOSHead, FPNP3P7, fcos_dcn_r50, fcos_r50
from .retinanet import RetinaNet, RetinaNetHead, retinanet_r50
from .cascade_rcnn import CascadeRCNN, cascade_rcnn_r50, faster_rcnn
from .yolox import YOLOX, yolox
from .gfl import GFL, gfl_r50
from .tood import TOOD, tood_r50
from .centernet import CenterNet, centernet_r50
from .ttfnet import TTFNet, ttfnet_darknet53
from .picodet import PicoDet, picodet_lcnet
from .solov2 import SOLOv2, solov2_r50
from .deform import DeformConv2d
