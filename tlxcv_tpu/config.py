"""One config system (replaces the reference's three: TL_BACKEND env vars,
constructor kwargs, and YAML+Registry — SURVEY.md §5.6).

A flat registry of model factories keyed by name, plus a dataclass-style
Config that builds models/optimizers/tasks from plain dicts (YAML- and
JSON-loadable)."""
from __future__ import annotations

import dataclasses
import json
import typing as tp

_MODEL_REGISTRY: dict[str, tp.Callable] = {}


def register_model(name=None):
    def deco(fn):
        _MODEL_REGISTRY[name or fn.__name__] = fn
        return fn
    return deco


def list_models(filter: str = ""):
    return sorted(k for k in _MODEL_REGISTRY if filter in k)


def create_model(name, **kwargs):
    _populate()
    try:
        factory = _MODEL_REGISTRY[name]
    except KeyError:
        close = [k for k in _MODEL_REGISTRY if name.lower() in k.lower()]
        raise KeyError(f"unknown model {name!r}; similar: {close[:8]}") from None
    return factory(**kwargs)


_POPULATED = False


def _populate():
    """Lazy-fill the registry from the model zoo modules."""
    global _POPULATED
    if _POPULATED:
        return
    _POPULATED = True
    from . import models as M
    from .models import classification as C
    from .models import rs as RS
    from .models import segmentation as S

    for mod in (C, S):
        for name in dir(mod):
            obj = getattr(mod, name)
            if callable(obj) and name[0].islower() and not name.startswith("_"):
                _MODEL_REGISTRY.setdefault(name, obj)
    extra = {
        "yolov3": lambda **k: M.YOLOv3(**k),
        "ssd": lambda **k: M.SSD(**k),
        "ppyoloe_s": lambda **k: M.ppyoloe("ppyoloe_s", **k),
        "ppyoloe_m": lambda **k: M.ppyoloe("ppyoloe_m", **k),
        "ppyoloe_l": lambda **k: M.ppyoloe("ppyoloe_l", **k),
        "ppyoloe_x": lambda **k: M.ppyoloe("ppyoloe_x", **k),
        "detr": lambda **k: M.detr_resnet50(**k),
        "mask_rcnn": lambda **k: __import__("tlxcv_tpu.models.detection", fromlist=["MaskRCNN"]).MaskRCNN(**k),
        "fcos_r50": lambda **k: __import__("tlxcv_tpu.models.detection", fromlist=["fcos_r50"]).fcos_r50(**k),
        "retinanet": lambda **k: __import__("tlxcv_tpu.models.detection", fromlist=["retinanet_r50"]).retinanet_r50(**k),
        "faster_rcnn": lambda **k: __import__("tlxcv_tpu.models.detection", fromlist=["faster_rcnn"]).faster_rcnn(**k),
        "cascade_rcnn": lambda **k: __import__("tlxcv_tpu.models.detection", fromlist=["cascade_rcnn_r50"]).cascade_rcnn_r50(**k),
        "gfl_r50": lambda **k: __import__("tlxcv_tpu.models.detection", fromlist=["gfl_r50"]).gfl_r50(**k),
        **{name: (lambda name: lambda **k: __import__(
            "tlxcv_tpu.models.detection", fromlist=["yolox"]).yolox(
            name, **k))(name)
           for name in ("yolox_nano", "yolox_tiny", "yolox_s", "yolox_m",
                        "yolox_l", "yolox_x")},
        "tood_r50": lambda **k: __import__("tlxcv_tpu.models.detection", fromlist=["tood_r50"]).tood_r50(**k),
        "centernet": lambda **k: __import__("tlxcv_tpu.models.detection", fromlist=["centernet_r50"]).centernet_r50(**k),
        "ttfnet": lambda **k: __import__("tlxcv_tpu.models.detection", fromlist=["ttfnet_darknet53"]).ttfnet_darknet53(**k),
        "picodet_lcnet": lambda **k: __import__("tlxcv_tpu.models.detection", fromlist=["picodet_lcnet"]).picodet_lcnet(**k),
        "solov2_r50": lambda **k: __import__("tlxcv_tpu.models.detection", fromlist=["solov2_r50"]).solov2_r50(**k),
        "fcos_dcn_r50": lambda **k: __import__("tlxcv_tpu.models.detection", fromlist=["fcos_dcn_r50"]).fcos_dcn_r50(**k),
        "pose_hrnet_w32": lambda **k: M.PoseHighResolutionNet(**k),
        "pfld": lambda **k: M.PFLD(**k),
        "retinaface": lambda **k: M.RetinaFace(**k),
        "arcface": lambda **k: M.ArcFace(**k),
        "trocr": lambda **k: M.TrOCR(**k),
        "i3d": lambda **k: M.InceptionI3d(**k),
        "dcgan": lambda **k: M.DCGANModel(**k),
        "cyclegan": lambda **k: M.CycleGANModel(**k),
        # README-table aliases for differently-suffixed factories
        "darknet53": lambda **k: C.darknet53_cls(**k),
        "pp_hgnet": lambda **k: C.pp_hgnet_small(**k),
        "rexnet": lambda **k: C.rexnet_1_0(**k),
        "bit": lambda **k: RS.BIT(**k),
        "snunet": lambda **k: RS.SNUNet(**k),
        "fc_ef": lambda **k: RS.FCEarlyFusion(**k),
        "farseg": lambda **k: RS.FarSeg(**k),
    }
    for k, v in extra.items():
        _MODEL_REGISTRY.setdefault(k, v)


@dataclasses.dataclass
class Config:
    """Flat experiment config: model + optimizer + training params."""

    model: str = "resnet50"
    model_kwargs: dict = dataclasses.field(default_factory=dict)
    task: str = "classification"
    optimizer: str = "Adam"
    lr: float = 1e-3
    optimizer_kwargs: dict = dataclasses.field(default_factory=dict)
    batch_size: int = 32
    n_epoch: int = 10
    seed: int = 0
    ema_decay: tp.Optional[float] = None  # Trainer weight-EMA (e.g. 0.9998)

    @classmethod
    def from_file(cls, path):
        with open(path) as f:
            if path.endswith((".yaml", ".yml")):
                import yaml

                d = yaml.safe_load(f)
            else:
                d = json.load(f)
        return cls(**d)

    def build_model(self):
        return create_model(self.model, **self.model_kwargs)

    def build_optimizer(self):
        from .train import optimizers as opt

        return getattr(opt, self.optimizer)(self.lr, **self.optimizer_kwargs)

    def build_task(self):
        from . import tasks

        names = {
            "classification": tasks.ImageClassification,
            "segmentation": tasks.ImageSegmentation,
            "detection": tasks.ObjectDetection,
            "pose": tasks.HumanPoseEstimation,
            "landmark": tasks.FacialLandmarkDetection,
            "ocr": tasks.OpticalCharacterRecognition,
            "video": tasks.VideoClassification,
            "gan": tasks.GAN,
        }
        return names[self.task](self.build_model())

    def build_trainer(self, network=None, **kw):
        """Task + optimizer + Trainer in one step (EMA wired through)."""
        from .train import Trainer

        net = network if network is not None else self.build_task()
        kw.setdefault("ema_decay", self.ema_decay)
        return Trainer(network=net, optimizer=self.build_optimizer(),
                       seed=self.seed, **kw)


def load_seg_config(path):
    """Load a PaddleSeg-style segmentation YAML with `_base_` inheritance
    (reference tlxcv/models/segmentation/configs tree): child keys
    override the base's; `loss`/`model`/datasets merge shallowly."""
    import os

    import yaml

    with open(path) as f:
        cfg = yaml.safe_load(f)
    base_rel = cfg.pop("_base_", None)
    if base_rel:
        base = load_seg_config(
            os.path.normpath(os.path.join(os.path.dirname(path), base_rel)))
        base.update(cfg)
        cfg = base
    return cfg


def build_seg_model(cfg_or_path):
    """Build the segmentation model named by a seg config (dict or path)."""
    cfg = (load_seg_config(cfg_or_path) if isinstance(cfg_or_path, str)
           else dict(cfg_or_path))
    from .models import segmentation as S

    m = dict(cfg["model"])
    name = m.pop("type")
    kwargs = {}
    if "num_classes" in m:
        kwargs["num_classes"] = m["num_classes"]
    # string backbone specs ("resnet50_vd") are built here
    if isinstance(m.get("backbone"), str):
        if name == "DeepLabV3P":
            return S.deeplabv3p(backbone=m["backbone"], **kwargs)
        from .models.backbones import resnet_vd

        bb = getattr(resnet_vd, m["backbone"])()
        kwargs["backbone"] = bb
    factory = getattr(S, name, None)
    if factory is None:
        return create_model(name, **kwargs)
    return factory(**kwargs)


def build_gan_trainer(path):
    """Build (nets, trainer) from a configs/gan/*.yaml recipe."""
    import yaml

    with open(path) as f:
        cfg = yaml.safe_load(f)
    kind = cfg["model"]
    tkw = dict(cfg.get("trainer", {}))

    def _attach_validator(nets_trainer):
        from .train.gan_validate import GanValidator

        nets, trainer = nets_trainer
        trainer.validator = GanValidator.from_config(cfg.get("validate"))
        return nets, trainer

    if kind == "cyclegan":
        from .models.gan.cyclegan import CycleGANModel
        from .train import GANTrainer

        gkw = dict(cfg.get("generator", {}))
        dkw = dict(cfg.get("discriminator", {}))
        net = CycleGANModel(
            ngf=gkw.get("ngf", 64), ndf=dkw.get("ndf", 64),
            n_blocks=gkw.get("n_blocks", 9),
            lambda_a=tkw.get("lambda_a", 10.0),
            lambda_b=tkw.get("lambda_b", 10.0),
            lambda_identity=tkw.get("lambda_identity", 0.5))
        import optax

        opt = optax.adam(tkw.get("lr", 2e-4), b1=tkw.get("beta1", 0.5))
        return _attach_validator(
            (net, GANTrainer(net, optimizer_g=opt, optimizer_d=opt)))
    if kind == "prenet":
        # Deraining is supervised (rainy -> clean): generic Trainer, not
        # the adversarial loop (reference prenet.yaml has no netD).
        from .models.gan.prenet import PReNetModel
        from .train import Trainer

        gkw = dict(cfg.get("generator", {}))
        net = PReNetModel({"recurrent_iter": gkw["recurrent_iter"]}
                          if "recurrent_iter" in gkw else None)
        import optax

        lr = tkw.get("lr", 1e-3)
        sched = lr
        if "milestones" in tkw:
            steps_per = tkw.get("steps_per_epoch", 1)
            sched = optax.piecewise_constant_schedule(
                lr, {int(m * steps_per): tkw.get("gamma", 0.2)
                     for m in tkw["milestones"]})
        return _attach_validator(
            (net, Trainer(network=net, loss_fn=net.loss_fn,
                          optimizer=optax.adam(sched))))
    if kind == "styleganv2":
        from .models.gan import (StyleGANv2Discriminator,
                                 StyleGANv2Generator)
        from .train import StyleGANv2Trainer

        g = StyleGANv2Generator(**cfg.get("generator", {}))
        d = StyleGANv2Discriminator(**cfg.get("discriminator", {}))
        return (g, d), StyleGANv2Trainer(g, d, **tkw)
    if kind == "ugatit":
        from .train import UGATITNets, UGATITTrainer

        nets = UGATITNets(generator=cfg.get("generator"),
                          disc_global=cfg.get("disc_global"),
                          disc_local=cfg.get("disc_local"))
        return nets, UGATITTrainer(nets, **tkw)
    if kind == "starganv2":
        from .train import StarGANv2Nets, StarGANv2Trainer

        nets = StarGANv2Nets(**cfg.get("nets", {}))
        return nets, StarGANv2Trainer(nets, **tkw)
    raise ValueError(f"no gan trainer recipe for {kind!r}")
