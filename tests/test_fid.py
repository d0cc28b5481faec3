"""FID metric (utils/fid.py): identical distributions score ~0; the
score grows with distribution shift."""
import numpy as np
import pytest


def test_fid_zero_and_ordering(rng):
    from tlxcv_tpu.utils.fid import FID, frechet_distance

    # analytic: identical gaussians -> 0; shifted mean -> ||d||^2
    mu = np.zeros(4)
    sig = np.eye(4)
    assert frechet_distance(mu, sig, mu, sig) == pytest.approx(0.0, abs=1e-8)
    mu2 = np.ones(4) * 2.0
    assert frechet_distance(mu, sig, mu2, sig) == pytest.approx(16.0, abs=1e-6)

    fid = FID(input_size=75, batch_size=8)  # small eval size for speed
    real = rng.normal(size=(16, 32, 32, 3)).astype(np.float32) * 0.25
    same = real + rng.normal(size=real.shape).astype(np.float32) * 0.01
    shifted = real + 1.5

    fid.update(real)
    fid.update_fake(same)
    close = fid.result()

    fid.reset()
    fid.update(real)
    fid.update_fake(shifted)
    far = fid.result()
    assert np.isfinite(close) and np.isfinite(far)
    assert far > close * 3 + 1e-3, (close, far)
