"""Shared classifier helpers (reference
tlxcv/models/classification/utils/common_func.py:1-16)."""
from __future__ import annotations


def make_divisible(v, divisor=8, min_value=None):
    if min_value is None:
        min_value = divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v
