"""GPT-2 byte-level BPE tokenizer vs the transformers oracle.

Trains a tiny byte-level BPE with `tokenizers` (same library family the
reference's demo/ocr vocab.json+merges.txt come from), then compares
models/ocr/transform.BPETokenizer against transformers.GPT2Tokenizer on
the same files — encode ids and decode round-trips must match exactly,
incl. contractions, multi-space runs, and multi-byte UTF-8.
"""
import os

import pytest


@pytest.fixture(scope="module")
def bpe_files(tmp_path_factory):
    tokenizers = pytest.importorskip("tokenizers")
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers

    d = str(tmp_path_factory.mktemp("bpe"))
    tok = Tokenizer(models.BPE())
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    trainer = trainers.BpeTrainer(
        vocab_size=400, special_tokens=["<s>", "</s>", "<pad>", "<unk>"],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet())
    corpus = ["hello world", "the quick brown fox jumps over the lazy dog",
              "JPEG decode 123 456", "tpu native framework!",
              "abc123 mix"] * 50
    tok.train_from_iterator(corpus, trainer)
    tok.model.save(d)
    return os.path.join(d, "vocab.json"), os.path.join(d, "merges.txt")


CASES = ["hello world", "abc123 mix", "the quick brown fox!",
         "JPEG decode 123", "I'll don't it's", "  two  spaces",
         "naïve café ☕"]


def test_bpe_matches_gpt2_oracle(bpe_files):
    transformers = pytest.importorskip("transformers")
    from transformers import GPT2Tokenizer

    from tlxcv_tpu.models.ocr.transform import BPETokenizer

    vocab, merges = bpe_files
    ref = GPT2Tokenizer(vocab, merges)
    mine = BPETokenizer(vocab, merges)
    for s in CASES:
        r, m = ref.encode(s), mine.encode(s)
        assert r == m, (s, r, m)
        assert ref.decode(r) == mine.decode(m) == s
