"""Native C++ input-pipeline ops vs cv2 oracle."""
import numpy as np
import pytest

from tlxcv_tpu import native
from tlxcv_tpu.data.transforms import FusedResizeNormalize


def test_native_resize_normalize_matches_cv2(rng):
    cv2 = pytest.importorskip("cv2")
    imgs = rng.integers(0, 256, size=(4, 97, 133, 3)).astype(np.uint8)
    mean, std = (125.3, 123.0, 113.9), (63.0, 62.1, 66.7)
    out = native.resize_normalize_batch(imgs, (64, 80), mean, std)
    assert out.shape == (4, 64, 80, 3) and out.dtype == np.float32
    ref = np.stack([cv2.resize(im, (80, 64), interpolation=cv2.INTER_LINEAR)
                    for im in imgs]).astype(np.float32)
    ref = (ref - mean) / std
    # cv2 interpolates in fixed point; allow small absolute slack
    np.testing.assert_allclose(out, ref, atol=0.05)


def test_fused_transform_single_image(rng):
    t = FusedResizeNormalize((32, 32), (0.0, 0.0, 0.0), (255.0, 255.0, 255.0))
    img = rng.integers(0, 256, size=(50, 60, 3)).astype(np.uint8)
    out = t(img)
    assert out.shape == (32, 32, 3)
    assert 0.0 <= out.min() and out.max() <= 1.0
