from . import anchors, boxes, hungarian, image, losses, nms, post_process, roi_align, yolo
from .boxes import (aligned_iou, batch_distance2bbox, bbox2delta, bbox2distance,
                    bbox_iou, box_area, clip_boxes, delta2bbox, distance2bbox,
                    pairwise_iou, xywh2xyxy, xyxy2xywh)
from .image import (interpolate, max_pool2d_with_argmax, max_unpool2d, pad2d,
                    resize, unfold)
from .losses import (binary_cross_entropy, cross_entropy, dice_loss, giou_loss,
                     l1_loss, mse_loss, sigmoid_focal_loss,
                     smooth_l1_loss, softmax_cross_entropy, varifocal_loss)
from .nms import batched_class_nms, matrix_nms, multiclass_nms, nms
from .yolo import yolo_box
from .post_process import cvt_results, rescale_dets
from .roi_align import paste_masks, roi_align
