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
    ("stanet", lambda: rs.STANet(3, 2)),
    ("stanet_pam", lambda: rs.STANet(3, 2, att_type="PAM")),
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


def test_dsifn_deep_supervision():
    """Training mode yields 5 outputs (out5 + 4 upsampled aux), all at
    input resolution (reference dsifn.py :150-161)."""
    model = rs.DSIFN(3, 2)
    params, state = split(model)
    fwd = pure(model)
    t = jnp.zeros((1, 64, 64, 3))
    outs, _ = fwd(params, state, t, t + 1, training=True)
    assert len(outs) == 5
    for o in outs:
        assert o.shape == (1, 64, 64, 2)


def test_dsamnet_deep_supervision():
    model = rs.DSAMNet(3, 2)
    params, state = split(model)
    fwd = pure(model)
    t = jnp.zeros((1, 64, 64, 3))
    outs, _ = fwd(params, state, t, t + 1, training=True,
                  rngs=jax.random.key(0))
    assert len(outs) == 3
    assert outs[0].shape == (1, 64, 64, 2)
    assert outs[1].shape == (1, 64, 64, 2)  # dsl2 upsamples stride-2 feats
    assert outs[2].shape == (1, 64, 64, 2)  # dsl3 upsamples stride-4 feats


def test_fccdn_aux_heads_are_distinct():
    """Round-1 weak #8: the t1/t2 seg aux outputs must supervise the two
    temporal streams separately, not duplicate one tensor."""
    model = rs.FCCDN(3, 2)
    params, state = split(model)
    fwd = pure(model)
    t1 = jnp.zeros((1, 64, 64, 3))
    t2 = jnp.ones((1, 64, 64, 3))
    (y, s1, s2), _ = fwd(params, state, t1, t2, training=True)
    assert y.shape == (1, 64, 64, 2)
    assert s1.shape == s2.shape == (1, 32, 32, 1)  # stride-2 seg logits
    assert not np.allclose(np.asarray(s1), np.asarray(s2))


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
