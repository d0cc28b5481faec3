"""GAN validate loop: PSNR/SSIM kernels, GanValidator over the config
`validate:` schema, and the cyclegan/prenet recipe builders."""
import numpy as np
import pytest


def test_psnr_known_values(rng):
    from tlxcv_tpu.utils.image_metrics import psnr

    x = rng.uniform(0, 1, size=(2, 32, 32, 3)).astype(np.float32)
    assert np.all(np.isinf(np.asarray(psnr(x, x))))
    # uniform +10/255 offset -> mse = 100 -> 20*log10(255/10) = 28.13 dB
    y = np.clip(x + 10.0 / 255.0, 0, 1)
    mask = (x + 10.0 / 255.0 <= 1.0).all(axis=(1, 2, 3))
    vals = np.asarray(psnr(y, x))
    if mask.any():
        assert vals[mask] == pytest.approx(20 * np.log10(255 / 10), abs=0.05)
    # y-channel + crop options run and return finite values
    v2 = np.asarray(psnr(y, x, crop_border=4, test_y_channel=True))
    assert np.all(np.isfinite(v2))


def test_ssim_bounds_and_ordering(rng):
    from tlxcv_tpu.utils.image_metrics import ssim

    x = rng.uniform(0, 1, size=(2, 48, 48, 3)).astype(np.float32)
    self_sim = np.asarray(ssim(x, x))
    assert self_sim == pytest.approx(1.0, abs=1e-4)
    small = np.asarray(ssim(np.clip(x + rng.normal(0, 0.02, x.shape), 0, 1)
                            .astype(np.float32), x))
    big = np.asarray(ssim(np.clip(x + rng.normal(0, 0.3, x.shape), 0, 1)
                          .astype(np.float32), x))
    assert np.all(small > big)
    assert np.all(big > -1 - 1e-6) and np.all(small < 1 + 1e-6)


def test_gan_validator_psnr_ssim(rng):
    from tlxcv_tpu.train import GanValidator

    v = GanValidator(metrics={
        "psnr": {"name": "PSNR", "crop_border": 0, "test_y_channel": True},
        "ssim": {"name": "SSIM"},
    }, interval=5000)
    assert v.interval == 5000

    clean = [rng.uniform(0, 1, size=(2, 32, 32, 3)).astype(np.float32)
             for _ in range(3)]
    noisy = [np.clip(c + rng.normal(0, 0.1, c.shape), 0, 1).astype(np.float32)
             for c in clean]
    ds = list(zip(noisy, clean))

    res = v.run(lambda b: (b[0], b[1]), ds)
    assert set(res) == {"psnr", "ssim"}
    assert 5 < res["psnr"] < 40 and 0 < res["ssim"] < 1

    # a better "generator" (identity) scores strictly higher
    res2 = v.run(lambda b: (b[1], b[1]), ds)
    assert res2["ssim"] > res["ssim"]


def test_gan_validator_save_img(tmp_path, rng):
    from tlxcv_tpu.train import GanValidator

    v = GanValidator(metrics={"ssim": {"name": "SSIM"}}, save_img=True,
                     out_dir=str(tmp_path / "val"))
    x = rng.uniform(0, 1, size=(1, 16, 16, 3)).astype(np.float32)
    v.run(lambda b: (b, b), [x])
    assert (tmp_path / "val" / "fake.npy").exists()


def test_build_cyclegan_recipe_trains(rng, tmp_path):
    from tlxcv_tpu.config import build_gan_trainer

    # micro config with the real file's schema (full-size build is tested
    # for loadability by the prenet case; keep the train step tiny)
    cfg = tmp_path / "cyclegan.yaml"
    cfg.write_text(
        "model: cyclegan\n"
        "generator: {ngf: 8, n_blocks: 1}\n"
        "discriminator: {ndf: 8}\n"
        "trainer: {lr: 0.0002, beta1: 0.5}\n"
        "validate:\n"
        "  interval: 30000\n"
        "  metrics:\n"
        "    fid: {name: FID, batch_size: 8}\n")
    net, trainer = build_gan_trainer(str(cfg))
    assert trainer.paired
    assert trainer.validator is not None and trainer.validator.interval == 30000
    a = rng.normal(size=(1, 32, 32, 3)).astype(np.float32)
    b = rng.normal(size=(1, 32, 32, 3)).astype(np.float32)
    # one paired adversarial step updates both G and D params
    g_before = {k: np.asarray(v) for k, v in trainer.params_g.items()}
    trainer.train(1, [(a, b)])
    changed = any(not np.allclose(np.asarray(trainer.params_g[k]), g_before[k])
                  for k in g_before)
    assert changed


def test_build_prenet_recipe_is_supervised(rng):
    from tlxcv_tpu.config import build_gan_trainer
    from tlxcv_tpu.train import Trainer

    net, trainer = build_gan_trainer("configs/gan/prenet.yaml")
    assert isinstance(trainer, Trainer)
    assert trainer.validator is not None
    spec = trainer.validator.spec
    assert {k.upper() for k in spec} == {"PSNR", "SSIM"}
