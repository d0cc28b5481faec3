"""Size variants completing the reference README classification table
(README.md:34-93): dla102, dpn107, hardnet39/85, rednet101, xception65,
xception41/65_deeplab, esnet_x0_5, dvt.  Forward in training mode
(deep residual stacks blow past f32 at eval with UNTRAINED BatchNorm
running stats — a random-init artifact, not an architecture bug; the
oracle-parity waves cover trained-stat numerics for each family)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tlxcv_tpu.core import Rngs, pure, split
from tlxcv_tpu.models import classification as C

VARIANTS = [
    ("esnet_x0_5", C.esnet_x0_5, 64),
    ("rednet101", C.rednet101, 64),
    ("xception65", C.xception65, 64),
    ("xception41_deeplab", C.xception41_deeplab, 64),
    ("xception65_deeplab", C.xception65_deeplab, 64),
    ("dla102", C.dla102, 64),
    ("dpn107", C.dpn107, 64),
    ("hardnet85", C.hardnet85, 64),
    ("hardnet39", C.hardnet39, 64),
    ("dvt", C.dvt, 224),
]


@pytest.mark.parametrize("name,factory,size", VARIANTS,
                         ids=[v[0] for v in VARIANTS])
def test_variant_forward(name, factory, size):
    model = factory(num_classes=7)
    params, state = split(model)
    fwd = pure(model)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, size, size, 3)),
                    jnp.float32)
    out, _ = fwd(params, state, x, training=True,
                 rngs=Rngs(jax.random.key(0)))
    assert out.shape == (2, 7)
    assert np.isfinite(np.asarray(out)).all()


def test_variants_differ_from_base():
    """The variant factories actually change capacity, not just names."""
    def n_params(m):
        return sum(int(np.prod(v.shape)) for v in split(m)[0].values())

    assert n_params(C.dla102(num_classes=2)) > 2 * n_params(
        C.dla34(num_classes=2))
    assert n_params(C.dpn107(num_classes=2)) > 3 * n_params(
        C.dpn68(num_classes=2))
    assert n_params(C.hardnet85(num_classes=2)) > n_params(
        C.hardnet68(num_classes=2))
    assert n_params(C.hardnet39(num_classes=2)) < n_params(
        C.hardnet68(num_classes=2))
    assert n_params(C.xception65(num_classes=2)) > n_params(
        C.xception41(num_classes=2))
    assert n_params(C.esnet_x0_5(num_classes=2)) < n_params(
        C.esnet_x1_0(num_classes=2))
    assert n_params(C.rednet101(num_classes=2)) > n_params(
        C.rednet50(num_classes=2))


def test_registry_has_full_readme_table():
    """Every model name row of the reference README classification table
    maps to a registered factory (README.md:34-93)."""
    from tlxcv_tpu.config import _MODEL_REGISTRY, _populate

    _populate()
    names = set(_MODEL_REGISTRY)
    required = ["alexnet", "alt_gvt_base", "alt_gvt_small", "cspdarknet53",
                "darknet53", "dla34", "dla102", "dpn68", "dpn107", "dvt",
                "esnet_x0_5", "esnet_x1_0", "ghostnet", "googlenet",
                "hardnet39", "hardnet68", "hardnet85", "pcpvt_base",
                "pcpvt_large", "peleenet", "pp_hgnet", "pp_lcnet",
                "pp_lcnet_v2", "rednet26", "rednet50", "rednet101",
                "resnest50", "resnet50", "resnet101", "rexnet",
                "squeezenet1_1", "xception41", "xception65",
                "xception41_deeplab", "xception65_deeplab", "dcgan"]
    missing = [r for r in required if r not in names]
    assert not missing, missing
