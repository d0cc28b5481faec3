from .cyclegan import CycleGANModel, NLayerDiscriminator, ResnetGenerator
from .dcgan import DCDiscriminator, DCGANModel, DCGenerator
from .layers import (EqualConv2d, EqualLinear, FusedLeakyReLU,
                     Upfirdn2dBlur, Upfirdn2dDownsample, Upfirdn2dUpsample,
                     fused_leaky_relu, upfirdn2d)
from .registry import (DISCRIMINATORS, GENERATORS, MODELS, Registry,
                       build_discriminator, build_generator)
from .styleganv2 import StyleGANv2Discriminator, StyleGANv2Generator
from .prenet import PReNet, PReNetModel
from .starganv2 import (MappingNetwork, StarGANv2Discriminator,
                        StarGANv2Generator, StyleEncoder)
from .ugatit import UGATITDiscriminator, UGATITGenerator
from .sr import EDSRGenerator, SRModel, pixel_shuffle
from .wing import FAN, CoordConvTh, HourGlass
