from ..core.module import BatchStat, Cache, Module, Param, Rngs, Variable
from .layers import *  # noqa: F401,F403
from .layers import __all__ as _layers_all

__all__ = ["BatchStat", "Cache", "Module", "Param", "Rngs", "Variable"] + list(_layers_all)
