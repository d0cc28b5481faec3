"""Zoo parity wave 18: CycleGAN (resnet generator + PatchGAN), PReNet
(ConvLSTM recurrent rain removal), EDSR (pixel-shuffle SR) torch
oracles (reference tlxcv/models/gan/models/{generators/resnet.py,
discriminators/nlayers.py, generators/prenet.py, sr_model.py}).
"""
import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

from tlxcv_tpu.core import pure, split
from tlxcv_tpu.utils.convert import convert_by_order

torch.manual_seed(17)


def _convert(tm, model):
    unmatched = convert_by_order(
        {k: v.detach().numpy() for k, v in tm.eval().state_dict().items()},
        model, source="torch")
    assert not unmatched, unmatched


def _rp(x, p):
    return F.pad(x, (p, p, p, p), mode="reflect")


# ---------------------------------------------------------------- cyclegan
class TCGResBlock(tnn.Module):
    def __init__(self, dim):
        super().__init__()
        self.conv1 = tnn.Conv2d(dim, dim, 3, bias=False)
        self.norm1 = tnn.InstanceNorm2d(dim, affine=True)
        self.conv2 = tnn.Conv2d(dim, dim, 3, bias=False)
        self.norm2 = tnn.InstanceNorm2d(dim, affine=True)

    def forward(self, x):
        y = torch.relu(self.norm1(self.conv1(_rp(x, 1))))
        y = self.norm2(self.conv2(_rp(y, 1)))
        return x + y


class TCycleGen(tnn.Module):
    def __init__(self, ngf=8, n_blocks=2):
        super().__init__()
        self.stem_conv = tnn.Conv2d(3, ngf, 7, bias=False)
        self.stem_norm = tnn.InstanceNorm2d(ngf, affine=True)
        self.down1 = tnn.Conv2d(ngf, ngf * 2, 3, 2, 1, bias=False)
        self.down1_norm = tnn.InstanceNorm2d(ngf * 2, affine=True)
        self.down2 = tnn.Conv2d(ngf * 2, ngf * 4, 3, 2, 1, bias=False)
        self.down2_norm = tnn.InstanceNorm2d(ngf * 4, affine=True)
        self.blocks = tnn.ModuleList(TCGResBlock(ngf * 4)
                                     for _ in range(n_blocks))
        self.up1 = tnn.ConvTranspose2d(ngf * 4, ngf * 2, 3, 2, 1, 1,
                                       bias=False)
        self.up1_norm = tnn.InstanceNorm2d(ngf * 2, affine=True)
        self.up2 = tnn.ConvTranspose2d(ngf * 2, ngf, 3, 2, 1, 1, bias=False)
        self.up2_norm = tnn.InstanceNorm2d(ngf, affine=True)
        self.head = tnn.Conv2d(ngf, 3, 7)

    def forward(self, x):
        x = torch.relu(self.stem_norm(self.stem_conv(_rp(x, 3))))
        x = torch.relu(self.down1_norm(self.down1(x)))
        x = torch.relu(self.down2_norm(self.down2(x)))
        for blk in self.blocks:
            x = blk(x)
        x = torch.relu(self.up1_norm(self.up1(x)))
        x = torch.relu(self.up2_norm(self.up2(x)))
        return torch.tanh(self.head(_rp(x, 3)))


def test_cyclegan_generator_parity(rng):
    from tlxcv_tpu.models.gan.cyclegan import ResnetGenerator

    tm = TCycleGen()
    model = ResnetGenerator(ngf=8, n_blocks=2)
    _convert(tm, model)
    x = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(x)).numpy()
    import jax.numpy as jnp

    params, state = split(model)
    out, _ = pure(model)(params, state,
                         jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out),
                               ref.transpose(0, 2, 3, 1), atol=1e-4,
                               rtol=1e-4)


class TPatchGAN(tnn.Module):
    def __init__(self, ndf=8, n_layers=3):
        super().__init__()
        layers = [tnn.Conv2d(3, ndf, 4, 2, 1), tnn.LeakyReLU(0.2)]
        mult = 1
        for i in range(1, n_layers):
            prev, mult = mult, min(2 ** i, 8)
            layers += [tnn.Conv2d(ndf * prev, ndf * mult, 4, 2, 1,
                                  bias=False),
                       tnn.InstanceNorm2d(ndf * mult, affine=True),
                       tnn.LeakyReLU(0.2)]
        prev, mult = mult, min(2 ** n_layers, 8)
        layers += [tnn.Conv2d(ndf * prev, ndf * mult, 4, 1, 1, bias=False),
                   tnn.InstanceNorm2d(ndf * mult, affine=True),
                   tnn.LeakyReLU(0.2),
                   tnn.Conv2d(ndf * mult, 1, 4, 1, 1)]
        self.net = tnn.Sequential(*layers)

    def forward(self, x):
        return self.net(x)


def test_cyclegan_discriminator_parity(rng):
    from tlxcv_tpu.models.gan.cyclegan import NLayerDiscriminator

    tm = TPatchGAN()
    model = NLayerDiscriminator(ndf=8)
    _convert(tm, model)
    x = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(x)).numpy()
    import jax.numpy as jnp

    params, state = split(model)
    out, _ = pure(model)(params, state,
                         jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out),
                               ref.transpose(0, 2, 3, 1), atol=1e-4,
                               rtol=1e-4)


# ------------------------------------------------------------------ prenet
class TPReNet(tnn.Module):
    def __init__(self, iters=2, c=8):
        super().__init__()
        self.iters, self.c = iters, c
        self.conv0 = tnn.Sequential(tnn.Conv2d(6, c, 3, 1, 1), tnn.ReLU())
        self.res_blocks = tnn.ModuleList(tnn.Sequential(
            tnn.Conv2d(c, c, 3, 1, 1), tnn.ReLU(),
            tnn.Conv2d(c, c, 3, 1, 1), tnn.ReLU()) for _ in range(5))
        self.conv_i = tnn.Sequential(tnn.Conv2d(c * 2, c, 3, 1, 1),
                                     tnn.Sigmoid())
        self.conv_f = tnn.Sequential(tnn.Conv2d(c * 2, c, 3, 1, 1),
                                     tnn.Sigmoid())
        self.conv_g = tnn.Sequential(tnn.Conv2d(c * 2, c, 3, 1, 1),
                                     tnn.Tanh())
        self.conv_o = tnn.Sequential(tnn.Conv2d(c * 2, c, 3, 1, 1),
                                     tnn.Sigmoid())
        self.conv_out = tnn.Conv2d(c, 3, 3, 1, 1)

    def forward(self, inputs):
        b, _, hh, ww = inputs.shape
        x = inputs
        h = torch.zeros(b, self.c, hh, ww)
        cell = torch.zeros(b, self.c, hh, ww)
        for _ in range(self.iters):
            z = self.conv0(torch.cat([inputs, x], 1))
            z = torch.cat([z, h], 1)
            i = self.conv_i(z)
            f = self.conv_f(z)
            g = self.conv_g(z)
            o = self.conv_o(z)
            cell = f * cell + i * g
            h = o * torch.tanh(cell)
            r = h
            for blk in self.res_blocks:
                r = torch.relu(blk(r) + r)
            x = self.conv_out(r) + inputs
        return x


def test_prenet_parity(rng):
    from tlxcv_tpu.models.gan.prenet import PReNet

    tm = TPReNet()
    model = PReNet(recurrent_iter=2, channels=8)
    _convert(tm, model)
    x = rng.normal(size=(1, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(x)).numpy()
    import jax.numpy as jnp

    params, state = split(model)
    out, _ = pure(model)(params, state,
                         jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out),
                               ref.transpose(0, 2, 3, 1), atol=1e-4,
                               rtol=1e-4)


# -------------------------------------------------------------------- edsr
class TEDSRResBlock(tnn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv1 = tnn.Conv2d(ch, ch, 3, 1, 1)
        self.conv2 = tnn.Conv2d(ch, ch, 3, 1, 1)

    def forward(self, x):
        return x + self.conv2(torch.relu(self.conv1(x)))


def _hwc_pixel_shuffle(x, r):
    """torch mirror of the framework's NHWC depth-to-space channel order
    (r_i, r_j, c_out) — real torch checkpoints (c_out, r_i, r_j) need a
    channel permute of the preceding conv, like the flatten caveat."""
    n, c, h, w = x.shape
    cout = c // (r * r)
    x = x.reshape(n, r, r, cout, h, w)
    x = x.permute(0, 3, 4, 1, 5, 2)
    return x.reshape(n, cout, h * r, w * r)


class TEDSR(tnn.Module):
    def __init__(self, n_resblocks=2, n_feats=8):
        super().__init__()
        self.head = tnn.Conv2d(3, n_feats, 3, 1, 1)
        self.body = tnn.ModuleList(TEDSRResBlock(n_feats)
                                   for _ in range(n_resblocks))
        self.body_tail = tnn.Conv2d(n_feats, n_feats, 3, 1, 1)
        self.up = tnn.Conv2d(n_feats, n_feats * 4, 3, 1, 1)
        self.tail = tnn.Conv2d(n_feats, 3, 3, 1, 1)

    def forward(self, x):
        x = self.head(x)
        y = x
        for blk in self.body:
            y = blk(y)
        x = x + self.body_tail(y)
        x = _hwc_pixel_shuffle(self.up(x), 2)
        return self.tail(x)


def test_edsr_parity(rng):
    from tlxcv_tpu.models.gan.sr import EDSRGenerator

    tm = TEDSR()
    model = EDSRGenerator(scale=2, n_resblocks=2, n_feats=8)
    _convert(tm, model)
    x = rng.normal(size=(1, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(x)).numpy()
    import jax.numpy as jnp

    params, state = split(model)
    out, _ = pure(model)(params, state,
                         jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out),
                               ref.transpose(0, 2, 3, 1), atol=1e-4,
                               rtol=1e-4)
