"""Synth90k + TrOCR demo (reference demo/ocr/train.py).  Uses the BPE
tokenizer if vocab files exist, else the hermetic char tokenizer."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))
import os

import numpy as np

from tlxcv_tpu.data import DataLoader, Synth90k
from tlxcv_tpu.models.ocr import (BPETokenizer, CharTokenizer, TrOCR,
                                  TrOCRTransform)
from tlxcv_tpu.tasks import OpticalCharacterRecognition
from tlxcv_tpu.tasks.ocr import valid
from tlxcv_tpu.train import Trainer, optimizers

if __name__ == "__main__":
    if os.path.exists("./demo/ocr/vocab.json"):
        tokenizer = BPETokenizer("./demo/ocr/vocab.json",
                                 "./demo/ocr/merges.txt")
        vocab_size = len(tokenizer.encoder)
    else:
        tokenizer = CharTokenizer()
        vocab_size = tokenizer.vocab_size
    transform = TrOCRTransform(tokenizer, size=(384, 384), max_length=32)

    train_dataset = Synth90k(root="./data/Synth90k", split="train",
                             transforms=lambda img, txt: transform(img, txt))
    train_dataloader = DataLoader(train_dataset, batch_size=8, shuffle=True)

    backbone = TrOCR(vocab_size=vocab_size, max_length=32)
    model = OpticalCharacterRecognition(backbone)

    trainer = Trainer(network=model,
                      loss_fn=lambda out, y: backbone.loss_fn(out, y),
                      optimizer=optimizers.AdamW(5e-5))
    trainer.train(n_epoch=10, train_dataset=train_dataloader, print_freq=1)
    print("CER:", valid(trainer, train_dataloader, tokenizer, max_batches=10))
    trainer.save_weights("./demo/ocr/model.npz")
