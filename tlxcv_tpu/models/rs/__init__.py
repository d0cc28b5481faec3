from .cd import (BIT, CDNet, DSAMNet, DSIFN, FCCDN, FCEarlyFusion, SNUNet,
                 STANet)
from .seg import DeepLabV3P, FarSeg, RSUNet
