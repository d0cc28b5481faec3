from . import init
from .module import (
    BatchStat, Cache, Module, Param, Rngs, Variable, call_context,
    is_training, iter_variables, load_state_dict, pure, rng, split, state_dict,
)

__all__ = [
    "init", "BatchStat", "Cache", "Module", "Param", "Rngs", "Variable",
    "call_context", "is_training", "iter_variables", "load_state_dict",
    "pure", "rng", "split", "state_dict",
]
