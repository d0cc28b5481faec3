from .upsample import upsample2x_bilinear, upsample2x_matmul
