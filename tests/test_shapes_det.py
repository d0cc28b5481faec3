"""ShapesDetection procedural fixture: determinism, box/pixel
consistency, and the end-to-end train->predict->mAP loop (tiny)."""
import numpy as np
import pytest


def test_deterministic_and_in_bounds():
    from tlxcv_tpu.data import ShapesDetection

    ds = ShapesDetection(num=8, size=64, seed=3)
    im1, t1 = ds[5]
    im2, t2 = ds[5]
    np.testing.assert_array_equal(im1, im2)
    np.testing.assert_array_equal(t1["boxes"], t2["boxes"])
    assert im1.shape == (64, 64, 3) and im1.dtype == np.float32
    assert (t1["boxes"] >= 0).all() and (t1["boxes"] <= 64).all()
    assert len(t1["boxes"]) == len(t1["class_labels"]) >= 1
    assert set(np.unique(t1["class_labels"])) <= {0, 1, 2}


def test_boxes_cover_bright_pixels():
    """Drawn objects are bright (>=0.6); every box must contain bright
    pixels and the image must be mostly dark outside all boxes."""
    from tlxcv_tpu.data import ShapesDetection

    ds = ShapesDetection(num=16, size=64, seed=1)
    for i in range(16):
        im, t = ds[i]
        mask = np.zeros(im.shape[:2], bool)
        for (x1, y1, x2, y2), cls in zip(t["boxes"], t["class_labels"]):
            xi1, yi1 = int(np.floor(x1)), int(np.floor(y1))
            xi2, yi2 = int(np.ceil(x2)), int(np.ceil(y2))
            crop = im[yi1:yi2, xi1:xi2]
            assert (crop.max(-1) >= 0.6).any(), (i, cls)
            mask[yi1:yi2, xi1:xi2] = True
        outside = im[~mask]
        if outside.size:
            # background stays below the object color range
            assert (outside.max(-1) >= 0.6).mean() < 0.01
