from .upsample import (upsample2x_bilinear, upsample2x_fits,
                       upsample2x_fused, upsample2x_matmul,
                       upsample_add_fits, upsample_add_fused,
                       upsample_matmul)

__all__ = ["upsample2x_bilinear", "upsample2x_fits", "upsample2x_fused",
           "upsample2x_matmul", "upsample_add_fits", "upsample_add_fused",
           "upsample_matmul"]
