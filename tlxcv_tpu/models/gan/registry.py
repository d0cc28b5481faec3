"""Config-name -> class registry (reference tlxcv/models/gan/utils/
registry.py:8-60 and generators/discriminators builder.py)."""
from __future__ import annotations

import typing as tp


class Registry:
    def __init__(self, name):
        self._name = name
        self._obj_map: dict[str, tp.Any] = {}

    def register(self, obj=None, name=None):
        if obj is None:
            def deco(cls):
                self._obj_map[name or cls.__name__] = cls
                return cls
            return deco
        self._obj_map[name or obj.__name__] = obj
        return obj

    def get(self, name):
        try:
            return self._obj_map[name]
        except KeyError:
            raise KeyError(
                f"No object named '{name}' in '{self._name}' registry") from None

    def __contains__(self, name):
        return name in self._obj_map

    def keys(self):
        return self._obj_map.keys()


GENERATORS = Registry("GENERATOR")
DISCRIMINATORS = Registry("DISCRIMINATOR")
MODELS = Registry("MODEL")


def build_from_config(registry, cfg, **extra):
    cfg = dict(cfg)
    name = cfg.pop("name")
    return registry.get(name)(**cfg, **extra)


def build_generator(cfg, **extra):
    return build_from_config(GENERATORS, cfg, **extra)


def build_discriminator(cfg, **extra):
    return build_from_config(DISCRIMINATORS, cfg, **extra)
