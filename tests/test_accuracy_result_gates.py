"""CI gates over committed hermetic accuracy-bar results.

Each demo accuracy_check writes a small results JSON when it runs (on
TPU, minutes each); these tests gate whatever is committed so any
regression that slips into a re-run fails the suite. The detection
sweep has its own gate in test_detection_accuracy_bars.py.
"""
import json
import os

import pytest

DEMO = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "demo")


def _load(*path):
    p = os.path.join(DEMO, *path)
    if not os.path.exists(p):
        pytest.skip(f"{'/'.join(path)} not yet produced on this checkout")
    with open(p) as f:
        return json.load(f)


def test_face_verification_bar():
    r = _load("face_recognition", "accuracy_results.json")
    assert r["metric"] == "verification_accuracy"
    assert r["value"] >= r["bar"], r


def test_video_classification_bar():
    r = _load("video_classification", "accuracy_results.json")
    assert r["metric"] == "clip_accuracy"
    assert r["value"] >= r["bar"], r


def test_instance_seg_bars():
    # floors documented in BENCHMARKS.md (Mask R-CNN 0.50 segm / 0.60
    # bbox, SOLOv2 0.50 segm)
    floors = {"maskrcnn": {"segm_map": 0.50, "bbox_map": 0.60},
              "solov2": {"segm_map": 0.50}}
    rows = _load("object_detection", "instance_seg_results.json")
    rows = {r["model"]: r for r in rows}
    for model, bars in floors.items():
        assert model in rows, rows.keys()
        assert rows[model].get("pass"), rows[model]
        for key, floor in bars.items():
            assert rows[model][key] >= floor, (model, key, rows[model])
