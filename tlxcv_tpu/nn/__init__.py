from ..core.module import BatchStat, Cache, Module, Param, Rngs, Variable
from .layers import *  # noqa: F401,F403
from .layers import __all__ as _layers_all
from .attention import (Attention, MultiHeadAttention,  # noqa: F401
                        scaled_dot_product_attention, use_flash_attention,
                        use_int8_attention)

__all__ = (["BatchStat", "Cache", "Module", "Param", "Rngs", "Variable"]
           + list(_layers_all)
           + ["Attention", "MultiHeadAttention",
              "scaled_dot_product_attention", "use_flash_attention",
              "use_int8_attention"])
