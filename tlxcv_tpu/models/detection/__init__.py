from .backbones.darknet import DarkNet, darknet53
from .ppyoloe import (CSPResNet, CustomCSPPAN, PPYOLOE, PPYOLOEHead, ppyoloe)
from .ssd import SSD, SSDHead, SSDLoss
from .yolov3 import YOLOv3, YOLOv3FPN, YOLOv3Head, YOLOv3Loss, gt2yolo_targets
from .mask_rcnn import FPN, MaskRCNN, RPNHead
