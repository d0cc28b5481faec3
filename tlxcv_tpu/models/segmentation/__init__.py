from .unet import Unet, unet
