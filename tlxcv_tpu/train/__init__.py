from . import optimizers
from .gan_trainer import GANTrainer
from .gan_validate import GanValidator
from .starganv2_trainer import StarGANv2Nets, StarGANv2Trainer
from .stylegan_trainer import StyleGANv2Trainer
from .trainer import Model, Trainer
from .ugatit_trainer import UGATITNets, UGATITTrainer

__all__ = ["optimizers", "Model", "Trainer", "GANTrainer", "GanValidator",
           "StyleGANv2Trainer", "UGATITNets", "UGATITTrainer",
           "StarGANv2Nets", "StarGANv2Trainer"]
