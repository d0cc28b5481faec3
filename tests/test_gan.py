"""GAN subsystem: DCGAN trains one step, upfirdn2d vs torch, CycleGAN losses."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from tlxcv_tpu.core import Rngs, pure, split


def test_dcgan_generator_shapes():
    from tlxcv_tpu.models.gan import DCGANModel

    m = DCGANModel({"input_nz": 16, "input_nc": 3, "output_nc": 3, "ngf": 8},
                   {"input_nc": 3, "ndf": 8})
    params, state = split(m)
    fwd = pure(m)
    real = jnp.zeros((2, 64, 64, 3))
    fake, _ = fwd(params, state, real, rngs=Rngs(noise=jax.random.key(0)))
    assert fake.shape == (2, 64, 64, 3)
    assert float(jnp.abs(fake).max()) <= 1.0


def test_gan_trainer_steps(rng):
    from tlxcv_tpu.models.gan import DCGANModel
    from tlxcv_tpu.train.gan_trainer import GANTrainer

    m = DCGANModel({"input_nz": 16, "input_nc": 3, "output_nc": 3, "ngf": 8},
                   {"input_nc": 3, "ndf": 8})
    tr = GANTrainer(m)
    data = [(rng.normal(size=(4, 64, 64, 3)).astype(np.float32), 0)
            for _ in range(3)]
    tr.train(n_epoch=2, train_dataset=data, print_freq=10)
    noise = rng.normal(size=(2, 1, 1, 16)).astype(np.float32)
    # generate via netG directly
    g = pure(m.netG)
    gp = {k[len("netG/"):]: v for k, v in tr.params_g.items()
          if k.startswith("netG/")}
    gs = {k[len("netG/"):]: v for k, v in tr.state.items()
          if k.startswith("netG/")}
    img, _ = g(gp, gs, jnp.asarray(noise))
    assert img.shape == (2, 64, 64, 3)


def test_upfirdn2d_blur_matches_depthwise_conv(rng):
    """Blur (up=down=1) == depthwise conv with the FIR kernel."""
    from tlxcv_tpu.models.gan import upfirdn2d
    from tlxcv_tpu.models.gan.layers import make_blur_kernel

    x = rng.normal(size=(1, 3, 8, 8)).astype(np.float32)
    k = make_blur_kernel((1, 3, 3, 1))
    xj = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    out = upfirdn2d(xj, k, pad=(2, 1))
    kt = torch.tensor(np.flip(k, (0, 1)).copy())[None, None].repeat(3, 1, 1, 1)
    ref = F.conv2d(F.pad(torch.tensor(x), (2, 1, 2, 1)), kt, groups=3).numpy()
    np.testing.assert_allclose(np.transpose(np.asarray(out), (0, 3, 1, 2)),
                               ref, atol=1e-5)


def test_upfirdn2d_upsample_shape(rng):
    from tlxcv_tpu.models.gan import Upfirdn2dUpsample

    up = Upfirdn2dUpsample()
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 4)), jnp.float32)
    y = up(x)
    assert y.shape == (1, 16, 16, 4)


def test_cyclegan_losses(rng):
    from tlxcv_tpu.models.gan import CycleGANModel

    m = CycleGANModel(ngf=8, ndf=8, n_blocks=2)
    params, state = split(m)
    a = jnp.asarray(rng.normal(size=(1, 64, 64, 3)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(1, 64, 64, 3)), jnp.float32)
    gl = pure(m, lambda mm, a, b: mm.g_loss(a, b))
    dl = pure(m, lambda mm, a, b: mm.d_loss(a, b))
    lg, _ = gl(params, state, a, b)
    ld, _ = dl(params, state, a, b)
    assert np.isfinite(float(lg)) and np.isfinite(float(ld))
    # d_loss must have zero grad wrt generators (stop_gradient)
    g = jax.grad(lambda p: dl(p, state, a, b)[0])(params)
    gen_grad = sum(float(jnp.abs(v).sum()) for k, v in g.items()
                   if k.startswith("netG"))
    assert gen_grad == 0.0
    disc_grad = sum(float(jnp.abs(v).sum()) for k, v in g.items()
                    if k.startswith("netD"))
    assert disc_grad > 0


def test_styleganv2_shapes(rng):
    from tlxcv_tpu.core import Rngs
    from tlxcv_tpu.models.gan import (StyleGANv2Discriminator,
                                      StyleGANv2Generator)

    g = StyleGANv2Generator(size=32, style_dim=16, n_mlp=2)
    p, s = split(g)
    img, _ = pure(g)(p, s, jnp.zeros((2, 16)),
                     rngs=Rngs(noise=jax.random.key(0)))
    assert img.shape == (2, 32, 32, 3)
    d = StyleGANv2Discriminator(size=32)
    pd, sd = split(d)
    out, _ = pure(d)(pd, sd, img)
    assert out.shape == (2, 1)


def test_extra_gan_generators(rng):
    from tlxcv_tpu.models.gan import (PReNet, StarGANv2Generator,
                                      UGATITGenerator)

    m = PReNet(recurrent_iter=2, channels=8)
    p, s = split(m)
    out, _ = pure(m)(p, s, jnp.zeros((1, 32, 32, 3)))
    assert out.shape == (1, 32, 32, 3)

    g = StarGANv2Generator(img_size=32, style_dim=8, dim_in=8,
                           max_conv_dim=32)
    p, s = split(g)
    out, _ = pure(g)(p, s, jnp.zeros((2, 32, 32, 3)), jnp.zeros((2, 8)))
    assert out.shape == (2, 32, 32, 3)

    ug = UGATITGenerator(ngf=8, n_blocks=2, img_size=32)
    p, s = split(ug)
    (img, cam, heat), _ = pure(ug)(p, s, jnp.zeros((1, 32, 32, 3)))
    assert img.shape == (1, 32, 32, 3) and cam.shape == (1, 2)
    assert heat.shape == (1, 8, 8, 1)
