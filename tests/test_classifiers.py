"""Smoke + shape tests for the classifier zoo: build, forward, grad-able."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tlxcv_tpu.core import pure, split
from tlxcv_tpu.models import classification as C

FACTORIES = [
    ("resnet18", C.resnet18, 96),
    ("resnet50", C.resnet50, 96),
    ("resnext50_32x4d", C.resnext50_32x4d, 96),
    ("wide_resnet50_2", C.wide_resnet50_2, 96),
    ("vgg11", lambda **k: C.vgg11(batch_norm=True, **k), 96),
    ("alexnet", C.alexnet, 128),
    ("mobilenet_v1", C.mobilenet_v1, 96),
    ("mobilenet_v2", C.mobilenet_v2, 96),
    ("mobilenet_v3_small", C.mobilenet_v3_small, 96),
    ("mobilenet_v3_large", C.mobilenet_v3_large, 96),
    ("efficientnet_b0", C.efficientnet_b0, 96),
    ("densenet121", C.densenet121, 96),
    ("googlenet", C.googlenet, 96),
    ("shufflenet_v2_x0_5", C.shufflenet_v2_x0_5, 96),
    ("squeezenet1_1", C.squeezenet1_1, 96),
    ("vit_small", lambda **k: C.VisionTransformer(
        img_size=96, patch_size=16, embed_dim=64, depth=2, num_heads=4, **k), 96),
    ("swin_micro", lambda **k: C.SwinTransformer(
        img_size=64, patch_size=4, embed_dim=24, depths=(1, 1, 2),
        num_heads=(2, 2, 4), window_size=4, **k), 64),
    ("convnext_micro", lambda **k: C.ConvNeXt(
        depths=(1, 1, 2, 1), dims=(16, 32, 64, 128), **k), 64),
    ("deit_micro", lambda **k: C.DistilledVisionTransformer(
        img_size=64, patch_size=16, embed_dim=32, depth=1, num_heads=2,
        **k), 64),
    ("regnetx", C.regnetx_4gf, 64),
    ("xception", C.xception41, 96),
    ("res2net50", C.res2net50_26w_4s, 64),
    ("ghostnet", C.ghostnet, 64),
    ("rednet26", C.rednet26, 64),
    ("pp_lcnet", C.pp_lcnet, 64),
    ("cspdarknet53", C.cspdarknet53, 64),
    ("van_b0", C.van_b0, 64),
    ("se_resnext50", C.se_resnext50_32x4d, 64),
    ("resnest50", C.resnest50, 64),
    ("pvt_v2_b0", C.pvt_v2_b0, 64),
    ("rexnet_1_0", C.rexnet_1_0, 64),
    ("dpn68", C.dpn68, 64),
    ("dla34", C.dla34, 64),
    ("mixnet_s", C.mixnet_s, 64),
    ("peleenet", C.peleenet, 64),
    ("hardnet68", C.hardnet68, 64),
    ("esnet", C.esnet_x1_0, 64),
    ("pp_lcnet_v2", C.pp_lcnet_v2, 64),
    ("pp_hgnet", C.pp_hgnet_small, 64),
    ("tnt_micro", lambda **k: C.TNT(img_size=64, depth=1, outer_dim=32,
                                    inner_dim=8, outer_heads=2,
                                    inner_heads=2, **k), 64),
    ("cswin_micro", lambda **k: C.CSWinTransformer(
        img_size=112, embed_dim=32, depths=(1, 1, 2, 1), heads=(2, 2, 4, 8),
        split_sizes=(1, 2, 7, 4), **k), 112),
    ("twins_micro", lambda **k: C.ALTGVT(
        embed_dims=(16, 32, 64, 128), num_heads=(1, 2, 4, 8),
        mlp_ratios=(4, 4, 4, 4), depths=(1, 1, 2, 1), wss=(2, 2, 2, 2),
        sr_ratios=(8, 4, 2, 1), **k), 64),
    ("pcpvt_micro", lambda **k: C.CPVTV2(
        embed_dims=(16, 32, 64, 128), num_heads=(1, 2, 4, 8),
        mlp_ratios=(4, 4, 4, 4), depths=(1, 1, 1, 1),
        sr_ratios=(8, 4, 2, 1), **k), 64),
    ("levit_micro", lambda **k: C.LeViT(
        img_size=64, embed_dim=(32, 64, 96), key_dim=(8, 8, 8),
        depth=(1, 1, 1), num_heads=(2, 2, 2), **k), 64),
    ("xception_deeplab", C.xception_deeplab, 64),
]


@pytest.mark.parametrize("name,factory,size", FACTORIES,
                         ids=[f[0] for f in FACTORIES])
def test_classifier_forward(name, factory, size):
    model = factory(num_classes=10)
    params, state = split(model)
    fwd = pure(model)
    x = jnp.zeros((2, size, size, 3), jnp.float32)
    out, _ = jax.jit(lambda p, s, x: fwd(p, s, x))(params, state, x)
    assert out.shape == (2, 10)
    assert np.isfinite(np.asarray(out)).all()


def test_vit_grads():
    model = C.VisionTransformer(img_size=32, patch_size=8, embed_dim=32,
                                depth=2, num_heads=2, num_classes=4,
                                qkv_bias=True)
    params, state = split(model)
    fwd = pure(model)
    x = jnp.ones((2, 32, 32, 3))

    def loss(p):
        out, _ = fwd(p, state, x)
        return (out ** 2).sum()

    g = jax.grad(loss)(params)
    assert all(np.isfinite(np.asarray(v)).all() for v in g.values())
    assert float(jnp.abs(g["pos_embed"]).sum()) > 0
    assert float(jnp.abs(g["blocks/0/attn/qkv/weight"]).sum()) > 0
