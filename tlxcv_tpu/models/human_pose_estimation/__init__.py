from .hrnet import (PoseHighResolutionNet, heatmap_mse_loss, pose_hrnet_w32)
