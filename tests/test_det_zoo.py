

def test_ssd_priors_scale_with_input():
    """build_ssd_priors keeps the SSD-paper RELATIVE scale ladder: the
    reference's 60..300 px table is its 300-input instantiation; other
    input sizes rescale it (r4 — the sweep's 128-input SSD had
    half-image priors vs 19-51 px fixture objects, mAP 0.24)."""
    import numpy as np

    from tlxcv_tpu.models.detection.ssd import build_ssd_priors

    hws = [(8, 8), (4, 4), (2, 2), (1, 1), (1, 1), (1, 1)]
    p300 = build_ssd_priors(hws, (300, 300))
    p128 = build_ssd_priors(hws, (128, 128))
    # priors are normalized xyxy: identical grids + relative ladder
    # => identical normalized boxes at any input size
    assert np.allclose(p300, p128, atol=1e-6)
    w300 = (p300[:, 2] - p300[:, 0]).min()
    # smallest prior stays 60/300 = 0.2 of the image
    assert abs(w300 - 60.0 / 300.0 / np.sqrt(2)) < 0.06, w300
    # explicit override wins
    pc = build_ssd_priors(hws, (128, 128), min_sizes=[20, 30, 40, 50, 60, 70])
    assert (pc[:, 2] - pc[:, 0]).min() < w300
