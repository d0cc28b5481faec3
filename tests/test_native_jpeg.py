"""Native JPEG decode pipeline (libjpeg via ctypes): roundtrip vs PIL,
fused decode+resize+normalize vs the two-step reference path."""
import io

import numpy as np
import pytest

from tlxcv_tpu import native


def _make_jpeg(rng, h, w, quality=95):
    from PIL import Image

    arr = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
    # smooth it so JPEG loss is small and comparisons are tight
    arr = np.asarray(Image.fromarray(arr).resize((w, h), Image.BILINEAR))
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, "JPEG", quality=quality)
    return buf.getvalue()


@pytest.mark.skipif(not native.jpeg_available(),
                    reason="libjpeg build unavailable")
def test_decode_matches_pil(rng):
    from PIL import Image

    data = _make_jpeg(rng, 37, 53)
    ours = native.decode_jpeg(data)
    ref = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    assert ours.shape == ref.shape == (37, 53, 3)
    # PIL and libjpeg may use different IDCT paths; allow tiny deltas
    assert np.mean(np.abs(ours.astype(int) - ref.astype(int))) < 1.5
    assert np.max(np.abs(ours.astype(int) - ref.astype(int))) <= 24


@pytest.mark.skipif(not native.jpeg_available(),
                    reason="libjpeg build unavailable")
def test_fused_pipeline_matches_two_step(rng):
    jpegs = [_make_jpeg(rng, 41, 61), _make_jpeg(rng, 64, 32)]
    mean, std = (127.5, 127.5, 127.5), (64.0, 64.0, 64.0)
    fused = native.decode_resize_normalize(jpegs, (24, 24), mean, std)
    assert fused.shape == (2, 24, 24, 3) and fused.dtype == np.float32
    for i, j in enumerate(jpegs):
        im = native.decode_jpeg(j)
        two = native.resize_normalize_batch(im, (24, 24), mean, std)[0]
        np.testing.assert_allclose(fused[i], two, atol=1e-4)


@pytest.mark.skipif(not native.jpeg_available(),
                    reason="libjpeg build unavailable")
def test_corrupt_jpeg_reports_index(rng):
    good = _make_jpeg(rng, 16, 16)
    with pytest.raises(ValueError, match="image 1"):
        native.decode_resize_normalize([good, b"not a jpeg"], (8, 8),
                                       (0,) * 3, (1,) * 3)
