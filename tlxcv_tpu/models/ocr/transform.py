"""OCR tokenizers (reference tlxcv/models/ocr/transform.py — a pure-python
GPT-2 byte-level BPE: bytes_to_unicode :27, get_pairs :13, TrOCRTransform
:44 reading demo/ocr/{merges.txt, vocab.json})."""
from __future__ import annotations

import json
import typing as tp

import numpy as np

__all__ = ["bytes_to_unicode", "get_pairs", "BPETokenizer", "CharTokenizer",
           "TrOCRTransform"]


def bytes_to_unicode():
    bs = (list(range(ord("!"), ord("~") + 1)) +
          list(range(ord("¡"), ord("¬") + 1)) +
          list(range(ord("®"), ord("ÿ") + 1)))
    cs = bs[:]
    n = 0
    for b in range(2 ** 8):
        if b not in bs:
            bs.append(b)
            cs.append(2 ** 8 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def get_pairs(word):
    pairs = set()
    prev = word[0]
    for ch in word[1:]:
        pairs.add((prev, ch))
        prev = ch
    return pairs


class BPETokenizer:
    """GPT-2 byte-level BPE (encode + decode), pure python host-side."""

    def __init__(self, vocab_file, merges_file, bos_token="<s>",
                 eos_token="</s>", pad_token="<pad>", unk_token="<unk>"):
        with open(vocab_file, encoding="utf-8") as f:
            self.encoder = json.load(f)
        self.decoder = {v: k for k, v in self.encoder.items()}
        with open(merges_file, encoding="utf-8") as f:
            merges = f.read().split("\n")[1:]
        merges = [tuple(m.split()) for m in merges if m and not m.startswith("#")]
        self.bpe_ranks = dict(zip(merges, range(len(merges))))
        self.byte_encoder = bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        self.cache: dict[str, str] = {}
        self.bos_token_id = self.encoder.get(bos_token, 0)
        self.eos_token_id = self.encoder.get(eos_token, 2)
        self.pad_token_id = self.encoder.get(pad_token, 1)
        self.unk_token = unk_token

    def bpe(self, token):
        if token in self.cache:
            return self.cache[token]
        word = tuple(token)
        pairs = get_pairs(word)
        if not pairs:
            return token
        while True:
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                i = j
                if (i < len(word) - 1 and word[i] == first and
                        word[i + 1] == second):
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = get_pairs(word)
        out = " ".join(word)
        self.cache[token] = out
        return out

    def encode(self, text):
        import re

        pat = re.compile(
            r"""'s|'t|'re|'ve|'m|'ll|'d| ?\w+| ?[^\s\w]+|\s+(?!\S)|\s+""")
        ids = []
        for token in re.findall(pat, text):
            token = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
            for bpe_token in self.bpe(token).split(" "):
                ids.append(self.encoder.get(bpe_token,
                                            self.encoder.get(self.unk_token, 3)))
        return ids

    def decode(self, ids):
        specials = {self.bos_token_id, self.eos_token_id, self.pad_token_id}
        text = "".join(self.decoder.get(int(i), "")
                       for i in ids if int(i) not in specials)
        data = bytearray(self.byte_decoder.get(c, 32) for c in text)
        return data.decode("utf-8", errors="replace")


class CharTokenizer:
    """Hermetic fallback: character-level tokenizer (tests, Synth90k)."""

    def __init__(self, alphabet="0123456789abcdefghijklmnopqrstuvwxyz"):
        self.bos_token_id, self.pad_token_id, self.eos_token_id = 0, 1, 2
        self.itos = ["<s>", "<pad>", "</s>"] + list(alphabet)
        self.stoi = {c: i for i, c in enumerate(self.itos)}
        self.vocab_size = len(self.itos)

    def encode(self, text):
        return [self.stoi[c] for c in text.lower() if c in self.stoi]

    def decode(self, ids):
        return "".join(self.itos[int(i)] for i in ids
                       if int(i) > 2 and int(i) < self.vocab_size)


class TrOCRTransform:
    """Image + text preprocessing for TrOCR (reference transform.py:44)."""

    def __init__(self, tokenizer, size=(384, 384), max_length=128,
                 mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5)):
        self.tokenizer = tokenizer
        self.size = size
        self.max_length = max_length
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)

    def __call__(self, image, text=None):
        import cv2

        img = cv2.resize(np.asarray(image), self.size[::-1])
        if img.ndim == 2:
            img = np.stack([img] * 3, -1)
        img = (img.astype(np.float32) / 255.0 - self.mean) / self.std
        if text is None:
            return img
        ids = self.tokenizer.encode(text)[: self.max_length - 1]
        ids = ids + [self.tokenizer.eos_token_id]
        ids += [self.tokenizer.pad_token_id] * (self.max_length - len(ids))
        return img, np.asarray(ids, np.int32)
