"""Hermetic sanity tests for the accuracy-bar fixture generators.

The TPU accuracy loops (demo/*/accuracy_check*.py) are multi-minute
runs; these tests pin the *fixtures* they train on so a silent fixture
regression can't masquerade as a model regression.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def test_ocr_glyph_render_is_readable():
    from demo.ocr.accuracy_check import GLYPHS, H, LEN, W, render

    rng = np.random.default_rng(0)
    img = render(rng, "01234")
    assert img.shape == (H, W, 3)
    # the digits must be markedly brighter than the background
    assert img.max() >= 0.7 and np.quantile(img, 0.2) < 0.3
    assert set(GLYPHS) == set("0123456789")
    for g in GLYPHS.values():
        assert g.shape == (5, 3)


def test_ocr_sample_labels_roundtrip():
    from tlxcv_tpu.models.ocr import CharTokenizer
    from demo.ocr.accuracy_check import LEN, sample

    tok = CharTokenizer()
    rng = np.random.default_rng(1)
    imgs, labels, texts = sample(rng, tok, 4)
    assert imgs.shape[0] == 4 and labels.shape == (4, LEN + 3)
    for row, text in zip(labels, texts):
        assert tok.decode(row) == text
        assert row[LEN] == tok.eos_token_id


def test_rain_fixture_is_supervised_pair():
    from demo.gan.accuracy_check import SIZE, batch

    rng = np.random.default_rng(0)
    rainy, clean = batch(rng, 3)
    assert rainy.shape == clean.shape == (3, SIZE, SIZE, 3)
    # rain only ADDS brightness, never removes
    assert (rainy - clean).min() >= -1e-6
    assert (rainy - clean).max() > 0.2
    assert 0.0 <= clean.min() and clean.max() <= 1.0


def test_landmark_fixture_augmentation_consistency():
    """Augmented samples keep landmarks on the drawn curves: the brow
    midpoint of the flipped sample must still be a bright pixel."""
    from demo.facial_landmark_detection.accuracy_check import (
        SIZE, _augment_pipeline, sample)

    rng = np.random.default_rng(3)
    augments = _augment_pipeline(np.random.default_rng(0))
    imgs, lms, eulers = sample(rng, 6, augments=augments)
    assert imgs.shape == (6, SIZE, SIZE, 3)
    assert lms.shape == (6, 136) and eulers.shape == (6, 3)
    lm = lms.reshape(6, 68, 2) * SIZE
    hits = 0
    for i in range(6):
        # jaw points lie on drawn lines unless occluded; count matches
        pts = np.clip(lm[i, :17].astype(int), 0, SIZE - 1)
        vals = imgs[i, pts[:, 1], pts[:, 0], 0]
        hits += (vals > 0.4).sum()
    # occlusion may hide some, but the majority must land on the sketch
    assert hits > 0.5 * 6 * 17, hits


def test_shapes_detection_masks_match_rendering():
    from tlxcv_tpu.data import ShapesDetection

    ds = ShapesDetection(num=8, size=96, max_objects=3, seed=5,
                         return_masks=True)
    for i in range(8):
        img, t = ds[i]
        masks = t["masks"]
        assert masks.shape[0] == len(t["boxes"])
        # masks are disjoint (visible-pixel semantics)
        assert masks.astype(int).sum(0).max() <= 1
        # each visible mask pixel is painted with its object color
        for m in masks:
            if m.sum() == 0:
                continue
            ys, xs = np.where(m)
            vals = img[ys, xs]
            # object colors are uniform in [0.6, 1]; allow frame class
            assert vals.min() >= 0.55
