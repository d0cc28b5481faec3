"""Exercise the previously-untested dataset parsers on synthetic
fixtures (VERDICT r1 §2.2 partials: Face300W, Synth90k, Charades,
CasiaWebFace)."""
import os

import numpy as np
import pytest
from PIL import Image


def _img(path, hw=(24, 32)):
    Image.fromarray(np.zeros(hw + (3,), np.uint8)).save(path)


def test_face300w_pts_and_mat(tmp_path):
    from scipy.io import savemat

    from tlxcv_tpu.data import Face300W
    from tlxcv_tpu.data.face300w import read_pts

    d = tmp_path / "300W" / "01_Indoor"
    d.mkdir(parents=True)
    lm = np.linspace(1, 68 * 2, 68 * 2).reshape(68, 2).astype(np.float32)
    for i in range(11):
        _img(d / f"indoor_{i:03d}.png")
        pts = "\n".join(f"{x:.3f} {y:.3f}" for x, y in lm)
        (d / f"indoor_{i:03d}.pts").write_text(
            f"version: 1\nn_points: 68\n{{\n{pts}\n}}\n")
    # one .mat-annotated sample
    _img(d / "mat_sample.png")
    savemat(d / "mat_sample.mat", {"pt2d": lm})

    full = Face300W(str(tmp_path / "300W"), split="all")
    assert len(full.samples) == 12
    train = Face300W(str(tmp_path / "300W"), split="train")
    test = Face300W(str(tmp_path / "300W"), split="test")
    assert len(train) + len(test) == 12 and len(test) == 2
    img, landmarks = train[0]
    assert img.shape == (24, 32, 3)
    np.testing.assert_allclose(landmarks, lm, atol=1e-4)
    # .pts reader standalone
    np.testing.assert_allclose(
        read_pts(str(d / "indoor_000.pts")), lm, atol=1e-4)


def test_synth90k_annotation_and_word_decode(tmp_path):
    from tlxcv_tpu.data import Synth90k

    sub = tmp_path / "90kDICT32px"
    (sub / "1").mkdir(parents=True)
    words = ["HELLO", "WORLD", "TPU"]
    lines = []
    for i, w in enumerate(words):
        rel = f"1/{i}_{w}_{i + 7}.jpg"
        _img(sub / rel)
        lines.append(f"./{rel} {i}\n")
    (sub / "annotation_train.txt").write_text("".join(lines))

    ds = Synth90k(str(sub), split="train")
    assert len(ds) == 3
    img, word = ds[1]
    assert word == "WORLD"
    assert img.shape == (24, 32, 3)


def test_charades_frames_and_label_matrix(tmp_path):
    from tlxcv_tpu.data import Charades
    from tlxcv_tpu.data.charades import FPS, NUM_CLASSES

    frames = tmp_path / "frames" / "VID01"
    frames.mkdir(parents=True)
    for i in range(48):  # 2 seconds at 24 fps
        _img(frames / f"{i:06d}.jpg")
    csv = tmp_path / "train.csv"
    csv.write_text("id,actions\nVID01,c005 0.0 1.0;c007 1.5 2.0\n")

    ds = Charades(str(tmp_path / "frames"), str(csv), num_frames=8)
    clip, label = ds[0]
    assert clip.shape == (8, 24, 32, 3)
    assert label.shape == (8, NUM_CLASSES)
    # first sampled frame is at t=0 -> action 5 active, 7 not
    assert label[0, 5] == 1.0 and label[0, 7] == 0.0
    # last sampled frame is at t=47/24≈1.96 -> action 7 active
    assert label[-1, 7] == 1.0 and label[-1, 5] == 0.0


def test_casiawebface_identity_split(tmp_path):
    from tlxcv_tpu.data import CasiaWebFace

    root = tmp_path / "casia"
    for ident in ("0000045", "0000099", "0000123"):
        d = root / ident
        d.mkdir(parents=True)
        for i in range(7):
            _img(d / f"{i:03d}.jpg")

    train = CasiaWebFace(str(root), split="train", test_ratio=0.2)
    test = CasiaWebFace(str(root), split="test", test_ratio=0.2)
    assert train.num_classes == 3
    assert len(train) + len(test) == 21
    assert len(test) == 4  # int(21 * 0.2)
    # splits are disjoint
    assert not (set(p for p, _ in train.samples)
                & set(p for p, _ in test.samples))
    img, label = train[0]
    assert img.shape == (24, 32, 3) and 0 <= label < 3
