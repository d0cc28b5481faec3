from .upsample import (upsample2x_bilinear, upsample2x_fits,
                       upsample2x_fused, upsample2x_matmul)

__all__ = ["upsample2x_bilinear", "upsample2x_fits", "upsample2x_fused",
           "upsample2x_matmul"]
