from .transform import (BPETokenizer, CharTokenizer, TrOCRTransform,
                        bytes_to_unicode, get_pairs)
from .trocr import TrOCR, TrOCRDecoder, ViTEncoder
