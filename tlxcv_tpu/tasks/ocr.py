"""OCR task (reference tlxcv/tasks/ocr.py: OpticalCharacterRecognition
:9-37, valid() with CER :40-66 — CER computed natively here, no jiwer
dependency)."""
from __future__ import annotations

import numpy as np

from .. import nn
from ..core.module import is_training


class OpticalCharacterRecognition(nn.Module):
    def __init__(self, backbone: nn.Module):
        self.backbone = backbone

    def __call__(self, inputs):
        # train-mode forward is identity on inputs: the loss re-runs the
        # decoder with teacher forcing (reference :23-37).  Eval-mode
        # forward runs the backbone (reference forward :14-18) so
        # generic eval paths do not silently operate on raw images.
        if is_training():
            return inputs
        return self.backbone(inputs)

    def loss_fn(self, output, target):
        return self.backbone.loss_fn(output, target)

    def predict(self, inputs):
        return self.backbone.generate(inputs)


def edit_distance(a, b):
    """Levenshtein distance (host-side)."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def character_error_rate(predictions, references):
    """CER over lists of strings (reference valid() used jiwer :40-66)."""
    assert len(predictions) == len(references), \
        (len(predictions), len(references))
    errors = sum(edit_distance(p, r) for p, r in zip(predictions, references))
    total = sum(len(r) for r in references)
    return errors / max(total, 1)


def valid(model_or_trainer, dataset, tokenizer, max_batches=None):
    """Greedy-decode a dataset and compute CER."""
    preds, refs = [], []
    for bi, (images, labels) in enumerate(dataset):
        if max_batches is not None and bi >= max_batches:
            break
        if hasattr(model_or_trainer, "predict"):
            tokens = model_or_trainer.predict(images)
        else:
            tokens = model_or_trainer.generate(images)
        tokens = np.asarray(tokens)
        for t, l in zip(tokens, np.asarray(labels)):
            preds.append(tokenizer.decode(t))
            refs.append(tokenizer.decode(l))
    return character_error_rate(preds, refs)
