from .pfld import PFLD, AuxiliaryNet, PFLDBackbone, pfld_loss
