from .attention import flash_attention
from .gather import gather_rows
from .upsample import (upsample2x_bilinear, upsample2x_fits,
                       upsample2x_fused, upsample2x_matmul,
                       upsample_add_fits, upsample_add_fused,
                       upsample_matmul)

__all__ = ["flash_attention", "gather_rows", "upsample2x_bilinear", "upsample2x_fits", "upsample2x_fused",
           "upsample2x_matmul", "upsample_add_fits", "upsample_add_fused",
           "upsample_matmul"]
