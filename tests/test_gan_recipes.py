"""GAN training recipes: StyleGANv2 R1/path-length regularizers change
parameters, UGATIT/StarGANv2 full drivers step, GAN YAMLs + seg config
tree load (VERDICT r1 item 8)."""
import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_styleganv2_regularizers_change_params(rng):
    from tlxcv_tpu.models.gan import (StyleGANv2Discriminator,
                                      StyleGANv2Generator)
    from tlxcv_tpu.train import StyleGANv2Trainer

    g = StyleGANv2Generator(size=8, style_dim=8, n_mlp=1)
    d = StyleGANv2Discriminator(size=8)
    tr = StyleGANv2Trainer(g, d, g_reg_every=1, d_reg_every=1)
    real = jnp.asarray(rng.normal(size=(2, 8, 8, 3)), jnp.float32)

    # R1 step alone moves discriminator params (grad-of-grad is nonzero)
    pd0 = {k: np.asarray(v).copy() for k, v in tr.pd.items()}
    tr.pd, tr.od, r1 = tr._d_reg_step(tr.pd, tr.sd, tr.od, real)
    assert float(r1) > 0
    moved = sum(1 for k in tr.pd
                if np.abs(np.asarray(tr.pd[k]) - pd0[k]).max() > 0)
    assert moved > 0

    # path-length step alone moves generator params and updates the EMA
    pg0 = {k: np.asarray(v).copy() for k, v in tr.pg.items()}
    tr.pg, tr.og, pl, new_mean = tr._g_reg_step(
        tr.pg, tr.sg, tr.og, tr.mean_path_length, jax.random.key(0),
        batch_size=1)
    assert float(pl) > 0 and float(new_mean) > 0
    moved_g = sum(1 for k in tr.pg
                  if np.abs(np.asarray(tr.pg[k]) - pg0[k]).max() > 0)
    assert moved_g > 0


def test_ugatit_driver_steps(rng):
    from tlxcv_tpu.train import UGATITNets, UGATITTrainer

    nets = UGATITNets(generator={"ngf": 4, "n_blocks": 1, "img_size": 16},
                      disc_global={"ndf": 4, "n_layers": 4},
                      disc_local={"ndf": 4, "n_layers": 4})
    tr = UGATITTrainer(nets)
    a = jnp.asarray(rng.normal(size=(1, 16, 16, 3)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(1, 16, 16, 3)), jnp.float32)
    pg, pd, og, od, state, dl, gl = tr._step(tr.pg, tr.pd, tr.og, tr.od,
                                             tr.state, a, b)
    assert np.isfinite(float(dl)) and np.isfinite(float(gl))
    # rho stays clipped to [0, 1]
    for k, v in pg.items():
        if k.endswith("rho"):
            arr = np.asarray(v)
            assert arr.min() >= 0.0 and arr.max() <= 1.0


def test_starganv2_driver_steps(rng):
    from tlxcv_tpu.train import StarGANv2Nets, StarGANv2Trainer

    nets = StarGANv2Nets(img_size=16, style_dim=8, latent_dim=4,
                         num_domains=2)
    tr = StarGANv2Trainer(nets)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 3)), jnp.float32)
    y0 = jnp.asarray([0, 1], jnp.int32)
    y1 = jnp.asarray([1, 0], jnp.int32)
    out = tr._step(tr.pg, tr.pd, tr.og, tr.od, tr.state, x, y0, y1,
                   jax.random.key(0))
    dl, gl = float(out[5]), float(out[6])
    assert np.isfinite(dl) and np.isfinite(gl)


def test_gan_yaml_configs_load():
    import yaml

    paths = sorted(glob.glob(os.path.join(REPO, "configs", "gan", "*.yaml")))
    assert len(paths) == 5  # the reference ships 5 training configs
    for p in paths:
        with open(p) as f:
            cfg = yaml.safe_load(f)
        assert "model" in cfg


def test_gan_trainer_from_yaml_ugatit_micro(tmp_path):
    from tlxcv_tpu.config import build_gan_trainer

    cfg = tmp_path / "u.yaml"
    cfg.write_text(
        "model: ugatit\n"
        "generator: {ngf: 4, n_blocks: 1, img_size: 16}\n"
        "disc_global: {ndf: 4, n_layers: 4}\n"
        "disc_local: {ndf: 4, n_layers: 4}\n"
        "trainer: {lr: 0.0001}\n")
    nets, trainer = build_gan_trainer(str(cfg))
    assert trainer is not None


def test_seg_config_tree_loads_and_builds():
    from tlxcv_tpu.config import build_seg_model, load_seg_config

    bases = glob.glob(os.path.join(REPO, "configs", "segmentation",
                                   "_base_", "*.yml"))
    assert len(bases) == 14  # reference ships 14 dataset bases
    for p in bases:
        cfg = load_seg_config(p)
        assert "train_dataset" in cfg
    model_cfgs = [p for p in glob.glob(os.path.join(
        REPO, "configs", "segmentation", "*", "*.yml"))
        if "_base_" not in p]
    assert len(model_cfgs) >= 8
    cfg = load_seg_config(os.path.join(
        REPO, "configs", "segmentation", "bisenet",
        "bisenet_cityscapes_1024x1024_160k.yml"))
    # child overrides the base lr; base supplies the dataset
    assert cfg["lr_scheduler"]["learning_rate"] == 0.05
    assert cfg["train_dataset"]["type"] == "Cityscapes"
    assert len(cfg["loss"]["types"]) == 5  # aux-loss recipe
    m = build_seg_model(cfg)
    assert type(m).__name__ == "BiSeNetV2"
