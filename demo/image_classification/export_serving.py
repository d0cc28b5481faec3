"""Export a trained classifier to a self-contained serving artifact.

The deployment story the reference never had: `utils.export_model`
AOT-compiles the model (weights baked in) to a StableHLO blob that any
JAX host can serve with zero model code — see the load-side below,
which deliberately never imports the model class.

Run: python demo/image_classification/export_serving.py [arch] [out.stablehlo]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))
import numpy as np

import tlxcv_tpu.models as models
from tlxcv_tpu.utils import export_model, load_exported, save_exported

if __name__ == "__main__":
    arch = sys.argv[1] if len(sys.argv) > 1 else "resnet18"
    out = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/{arch}.stablehlo"

    model = getattr(models, arch)(num_classes=10)
    # (for a real deployment: model.load_weights("model.npz") first)
    art = export_model(model, (224, 224, 3))   # polymorphic batch
    n = save_exported(out, art)
    print(f"exported {arch} -> {out} ({n / 1e6:.1f} MB)")

    # --- serving side: no model class, just the artifact ---
    serve = load_exported(out)
    for batch in (1, 8):
        x = np.random.rand(batch, 224, 224, 3).astype(np.float32)
        logits = np.asarray(serve(x))
        print(f"batch {batch}: logits {logits.shape}, "
              f"argmax {logits.argmax(-1)[:4]}")
