"""Hermetic GAN-domain quality validation — PReNet derain to a PSNR/SSIM bar.

VERDICT r2 weak #3: the GanValidator (PSNR/SSIM/FID) was wired but no
recipe was ever driven to a quality bar.  PReNet deraining is
supervised (rainy -> clean), so it admits an exact hermetic loop: a
procedural rain fixture (smooth colored scenes + synthetic diagonal
rain streaks), the configs/gan/prenet.yaml recipe's MODEL + VALIDATOR
(training itself uses a jitted adam/cosine loop — the recipe's
milestone schedule spans 100 epochs of real data and is not meaningful
at fixture scale), and the existing GanValidator scoring PSNR/SSIM
exactly as the reference's
validate spec declares them (reference
tlxcv/models/gan/configs/prenet.yaml validate.metrics:
PSNR/SSIM crop_border=0 test_y_channel).

Run: python demo/gan/accuracy_check.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tlxcv_tpu.config import build_gan_trainer
from tlxcv_tpu.core import pure, split

SIZE = 64
PSNR_BAR = 26.0   # dB on held-out rainy->clean (identity rainy input ~21)
SSIM_BAR = 0.85


def make_scene(rng):
    """Smooth clean image: low-frequency gradient + colored disks."""
    g = np.linspace(0, 1, SIZE, dtype=np.float32)
    img = (0.3 + 0.4 * g[None, :, None] * rng.uniform(0.3, 1.0, 3)
           + 0.3 * g[:, None, None] * rng.uniform(0.3, 1.0, 3))
    yy, xx = np.mgrid[0:SIZE, 0:SIZE].astype(np.float32)
    for _ in range(int(rng.integers(2, 5))):
        cx, cy = rng.uniform(8, SIZE - 8, 2)
        r = rng.uniform(5, 12)
        m = (xx - cx) ** 2 + (yy - cy) ** 2 <= r * r
        img[m] = rng.uniform(0.2, 0.9, 3)
    return np.clip(img, 0, 1).astype(np.float32)


def add_rain(rng, img):
    """Diagonal bright streaks (the classic synthetic-rain model)."""
    rainy = img.copy()
    n_streaks = int(rng.integers(40, 80))
    for _ in range(n_streaks):
        x0 = int(rng.integers(0, SIZE))
        y0 = int(rng.integers(0, SIZE))
        length = int(rng.integers(6, 14))
        slope = rng.uniform(0.2, 0.5)
        a = rng.uniform(0.25, 0.55)
        for t in range(length):
            y, x = y0 + t, int(x0 + slope * t)
            if 0 <= y < SIZE and 0 <= x < SIZE:
                rainy[y, x] = np.clip(rainy[y, x] + a, 0, 1)
    return rainy


def batch(rng, n):
    cleans = [make_scene(rng) for _ in range(n)]
    rains = [add_rain(rng, c) for c in cleans]
    return np.stack(rains), np.stack(cleans)


def main(steps=1200):
    cfg = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "..", "..", "configs", "gan", "prenet.yaml")
    net, trainer = build_gan_trainer(cfg)
    validator = trainer.validator
    assert validator is not None, "prenet.yaml validate block missing"

    params, state = split(net)
    lp = pure(net, lambda m, x, y: m.loss_fn(m(x), y))
    fwd = pure(net)
    sched = optax.cosine_decay_schedule(1e-3, steps)
    tx = optax.adam(sched)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, state, opt_state, x, y):
        def lf(p):
            loss, ns = lp(p, state, x, y, training=True)
            return loss, ns

        (loss, state), g = jax.value_and_grad(lf, has_aux=True)(params)
        u, opt_state = tx.update(g, opt_state)
        return optax.apply_updates(params, u), state, opt_state, loss

    rng = np.random.default_rng(0)
    t0 = time.time()
    for it in range(steps):
        x, y = batch(rng, 16)
        params, state, opt_state, loss = step(
            params, state, opt_state, jnp.asarray(x), jnp.asarray(y))
        if it % 200 == 0:
            print(f"it {it} loss {float(loss):.4f} ({time.time()-t0:.0f}s)",
                  flush=True)

    @jax.jit
    def derain(params, state, x):
        out, _ = fwd(params, state, x, training=False)
        return out

    vrng = np.random.default_rng(777)
    val_batches = [batch(vrng, 16) for _ in range(4)]
    # identity baseline: how bad is the rainy input itself?
    from tlxcv_tpu.utils import image_metrics as im

    # same metric as the validator (Y-channel per the recipe's
    # test_y_channel: true) — an RGB baseline would run ~1-3 dB lower
    # and silently weaken the margin check
    base_psnr = float(np.mean([
        np.mean(np.asarray(im.psnr(jnp.asarray(x), jnp.asarray(y),
                                   input_range="01", test_y_channel=True)))
        for x, y in val_batches]))

    def sample_fn(b):
        x, y = b
        return np.asarray(derain(params, state, jnp.asarray(x))), y

    results = validator.run(sample_fn, val_batches)
    line = " ".join(f"{k}={v:.4f}" for k, v in results.items())
    print(f"identity-rainy PSNR {base_psnr:.2f} dB | derained: {line} "
          f"({time.time()-t0:.0f}s)")
    # committed artifact for tests/test_accuracy_result_gates.py —
    # written BEFORE the asserts so a failing run still leaves evidence
    import json

    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "accuracy_results.json"), "w") as f:
        json.dump({"metric": "prenet_derain",
                   "psnr": float(results["psnr"]),
                   "ssim": float(results["ssim"]),
                   "psnr_bar": PSNR_BAR, "ssim_bar": SSIM_BAR,
                   "identity_psnr": base_psnr,
                   "seconds": round(time.time() - t0, 1)}, f, indent=1)
    assert results["psnr"] >= PSNR_BAR, (results, PSNR_BAR)
    assert results["ssim"] >= SSIM_BAR, (results, SSIM_BAR)
    assert results["psnr"] > base_psnr + 3.0, "must beat identity by >=3 dB"
    return results


if __name__ == "__main__":
    main()
