"""Remote-sensing change detection predict (mirrors reference
tlxcv/models/rs/cd/predict_rscd.py — loads each CD model and prints
output stats for a bitemporal pair)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))
import numpy as np

from tlxcv_tpu.core import pure, split
from tlxcv_tpu.models import rs

MODELS = {
    "fc_ef": lambda: rs.FCEarlyFusion(3, 2),
    "cdnet": lambda: rs.CDNet(3, 2),
    "snunet": lambda: rs.SNUNet(3, 2),
    "bit": lambda: rs.BIT(3, 2),
    "dsifn": lambda: rs.DSIFN(3, 2),
    "dsamnet": lambda: rs.DSAMNet(3, 2),
    "stanet": lambda: rs.STANet(3, 2),
    "fccdn": lambda: rs.FCCDN(3, 2),
}

if __name__ == "__main__":
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    t1 = jnp.asarray(rng.normal(size=(1, 256, 256, 3)), jnp.float32)
    t2 = jnp.asarray(rng.normal(size=(1, 256, 256, 3)), jnp.float32)
    for name, factory in MODELS.items():
        model = factory()
        params, state = split(model)
        out, _ = pure(model)(params, state, t1, t2)
        out = np.asarray(out)
        print(f"{name}: out {out.shape} mean {out.mean():+.4f}")
