"""OCR predict: one jitted KV-cache greedy decode per image
(reference demo/ocr/predict.py — no host-loop per-token decoding)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))
import numpy as np

from tlxcv_tpu.models.ocr import (BPETokenizer, CharTokenizer, TrOCR,
                                  TrOCRTransform)
from tlxcv_tpu.tasks import OpticalCharacterRecognition
from tlxcv_tpu.train import Trainer

if __name__ == "__main__":
    import cv2

    if os.path.exists("./demo/ocr/vocab.json"):
        tokenizer = BPETokenizer("./demo/ocr/vocab.json",
                                 "./demo/ocr/merges.txt")
        vocab_size = len(tokenizer.encoder)
    else:
        tokenizer = CharTokenizer()
        vocab_size = tokenizer.vocab_size
    transform = TrOCRTransform(tokenizer, size=(384, 384), max_length=32)

    image = cv2.cvtColor(cv2.imread("./demo/ocr/word.png"), cv2.COLOR_BGR2RGB)
    x = transform(image)[None]

    import jax
    import jax.numpy as jnp

    from tlxcv_tpu.core import pure, split

    backbone = TrOCR(vocab_size=vocab_size, max_length=32)
    model = OpticalCharacterRecognition(backbone)
    model.load_weights("./demo/ocr/model.npz")
    params, state = split(model)
    gen = jax.jit(lambda p, s, x: pure(model, lambda m, xx: m.predict(xx))(
        p, s, x)[0])
    tokens = np.asarray(gen(params, state, jnp.asarray(x)))
    print("text:", tokenizer.decode(tokens[0]))
