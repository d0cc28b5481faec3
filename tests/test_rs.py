"""Remote sensing: all change-detection and segmentation models build,
forward at input resolution."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tlxcv_tpu.core import pure, split
from tlxcv_tpu.models import rs


CD_MODELS = [
    ("fc_ef", lambda: rs.FCEarlyFusion(3, 2)),
    ("cdnet", lambda: rs.CDNet(3, 2)),
    ("snunet", lambda: rs.SNUNet(3, 2, width=4)),
    ("bit", lambda: rs.BIT(3, 2, dim=16, dec_depth=2)),
    ("dsifn", lambda: rs.DSIFN(3, 2)),
    ("dsamnet", lambda: rs.DSAMNet(3, 2)),
    ("stanet", lambda: rs.STANet(3, 2, att_dim=16)),
    ("fccdn", lambda: rs.FCCDN(3, 2)),
]


@pytest.mark.parametrize("name,factory", CD_MODELS,
                         ids=[c[0] for c in CD_MODELS])
def test_cd_models(name, factory):
    model = factory()
    params, state = split(model)
    fwd = pure(model)
    t1 = jnp.zeros((1, 64, 64, 3))
    t2 = jnp.ones((1, 64, 64, 3))
    out, _ = jax.jit(lambda p, s, a, b: fwd(p, s, a, b))(params, state, t1, t2)
    assert out.shape[:3] == (1, 64, 64)
    assert np.isfinite(np.asarray(out)).all()


def test_farseg():
    model = rs.FarSeg(num_classes=5, backbone_depth=18)
    params, state = split(model)
    fwd = pure(model)
    out, _ = jax.jit(lambda p, s, x: fwd(p, s, x))(
        params, state, jnp.zeros((1, 64, 64, 3)))
    assert out.shape == (1, 64, 64, 5)


def test_rsunet():
    model = rs.RSUNet(3, 2, width=8)
    params, state = split(model)
    fwd = pure(model)
    out, _ = fwd(params, state, jnp.zeros((1, 64, 64, 3)))
    assert out.shape == (1, 64, 64, 2)
