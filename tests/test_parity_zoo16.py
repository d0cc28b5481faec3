"""Zoo parity wave 16: U-GAT-IT generator + discriminator torch oracles
(reference tlxcv/models/gan/models/{generators/resnet_ugatit.py,
discriminators/discriminator_ugatit.py}) — verifies the restored
faithful topology: two-conv encoder ResnetBlocks, reflect padding
throughout, CAM gap/gmp channel reweighting, AdaILN/ILN norms,
bias-free style linears, and the (out, cam_logit, heatmap) returns.
"""
import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

from tests.test_parity_zoo import _x
from tlxcv_tpu.core import pure, split
from tlxcv_tpu.utils.convert import convert_by_order

torch.manual_seed(15)


def _rp(x, p):
    return F.pad(x, (p, p, p, p), mode="reflect")


class TILN(tnn.Module):
    def __init__(self, ch):
        super().__init__()
        self.rho = tnn.Parameter(torch.zeros(ch))
        self.gamma = tnn.Parameter(torch.ones(ch))
        self.beta = tnn.Parameter(torch.zeros(ch))

    def forward(self, x):
        inorm = (x - x.mean((2, 3), keepdim=True)) / torch.sqrt(
            x.var((2, 3), unbiased=False, keepdim=True) + 1e-5)
        lnorm = (x - x.mean((1, 2, 3), keepdim=True)) / torch.sqrt(
            x.var((1, 2, 3), unbiased=False, keepdim=True) + 1e-5)
        rho = self.rho.clamp(0, 1)[None, :, None, None]
        out = rho * inorm + (1 - rho) * lnorm
        return out * self.gamma[None, :, None, None] + \
            self.beta[None, :, None, None]


class TAdaILN(tnn.Module):
    def __init__(self, ch):
        super().__init__()
        self.rho = tnn.Parameter(torch.full((ch,), 0.9))

    def forward(self, x, gamma, beta):
        inorm = (x - x.mean((2, 3), keepdim=True)) / torch.sqrt(
            x.var((2, 3), unbiased=False, keepdim=True) + 1e-5)
        lnorm = (x - x.mean((1, 2, 3), keepdim=True)) / torch.sqrt(
            x.var((1, 2, 3), unbiased=False, keepdim=True) + 1e-5)
        rho = self.rho.clamp(0, 1)[None, :, None, None]
        out = rho * inorm + (1 - rho) * lnorm
        return out * gamma[:, :, None, None] + beta[:, :, None, None]


class TResnetBlock(tnn.Module):
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


class TResnetAdaILNBlock(tnn.Module):
    def __init__(self, dim):
        super().__init__()
        self.conv1 = tnn.Conv2d(dim, dim, 3, bias=False)
        self.norm1 = TAdaILN(dim)
        self.conv2 = tnn.Conv2d(dim, dim, 3, bias=False)
        self.norm2 = TAdaILN(dim)

    def forward(self, x, gamma, beta):
        y = torch.relu(self.norm1(self.conv1(_rp(x, 1)), gamma, beta))
        y = self.norm2(self.conv2(_rp(y, 1)), gamma, beta)
        return x + y


class TUGATITGen(tnn.Module):
    def __init__(self, ngf=8, n_blocks=2):
        super().__init__()
        self.stem = tnn.Sequential(
            tnn.Conv2d(3, ngf, 7, bias=False),
            tnn.InstanceNorm2d(ngf, affine=True), tnn.ReLU())
        self.down1 = tnn.Sequential(
            tnn.Conv2d(ngf, ngf * 2, 3, 2, bias=False),
            tnn.InstanceNorm2d(ngf * 2, affine=True), tnn.ReLU())
        self.down2 = tnn.Sequential(
            tnn.Conv2d(ngf * 2, ngf * 4, 3, 2, bias=False),
            tnn.InstanceNorm2d(ngf * 4, affine=True), tnn.ReLU())
        d = ngf * 4
        self.enc_blocks = tnn.ModuleList(
            TResnetBlock(d) for _ in range(n_blocks))
        self.gap_fc = tnn.Linear(d, 1, bias=False)
        self.gmp_fc = tnn.Linear(d, 1, bias=False)
        self.conv1x1 = tnn.Conv2d(d * 2, d, 1)
        self.fc = tnn.Sequential(tnn.Linear(d, d, bias=False), tnn.ReLU(),
                                 tnn.Linear(d, d, bias=False), tnn.ReLU())
        self.gamma = tnn.Linear(d, d, bias=False)
        self.beta = tnn.Linear(d, d, bias=False)
        self.dec_blocks = tnn.ModuleList(
            TResnetAdaILNBlock(d) for _ in range(n_blocks))
        self.up1_conv = tnn.Conv2d(d, ngf * 2, 3, bias=False)
        self.up1_norm = TILN(ngf * 2)
        self.up2_conv = tnn.Conv2d(ngf * 2, ngf, 3, bias=False)
        self.up2_norm = TILN(ngf)
        self.head = tnn.Conv2d(ngf, 3, 7, bias=False)

    def forward(self, x):
        x = self.stem(_rp(x, 3))
        x = self.down1(_rp(x, 1))
        x = self.down2(_rp(x, 1))
        for blk in self.enc_blocks:
            x = blk(x)
        gap = x.mean((2, 3))
        gmp = x.amax((2, 3))
        gap_logit = self.gap_fc(gap)
        gmp_logit = self.gmp_fc(gmp)
        x = torch.cat([x * self.gap_fc.weight[0][None, :, None, None],
                       x * self.gmp_fc.weight[0][None, :, None, None]], 1)
        x = torch.relu(self.conv1x1(x))
        cam_logit = torch.cat([gap_logit, gmp_logit], 1)
        heatmap = x.sum(dim=1, keepdim=True)
        style = self.fc(x.mean((2, 3)))
        gamma, beta = self.gamma(style), self.beta(style)
        for blk in self.dec_blocks:
            x = blk(x, gamma, beta)
        x = F.interpolate(x, scale_factor=2, mode="nearest")
        x = torch.relu(self.up1_norm(self.up1_conv(_rp(x, 1))))
        x = F.interpolate(x, scale_factor=2, mode="nearest")
        x = torch.relu(self.up2_norm(self.up2_conv(_rp(x, 1))))
        return torch.tanh(self.head(_rp(x, 3))), cam_logit, heatmap


def test_ugatit_generator_parity(rng):
    from tlxcv_tpu.models.gan.ugatit import UGATITGenerator

    tm = TUGATITGen().eval()
    model = UGATITGenerator(ngf=8, n_blocks=2, img_size=32)
    unmatched = convert_by_order(
        {k: v.detach().numpy() for k, v in tm.state_dict().items()},
        model, source="torch")
    assert not unmatched, unmatched
    x = _x(rng, 32, batch=1)
    with torch.no_grad():
        ref_img, ref_cam, ref_heat = tm(torch.tensor(x))
    import jax.numpy as jnp

    params, state = split(model)
    (img, cam, heat), _ = pure(model)(params, state,
                                      jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(img),
                               ref_img.numpy().transpose(0, 2, 3, 1),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(cam), ref_cam.numpy(), atol=1e-4,
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(heat),
                               ref_heat.numpy().transpose(0, 2, 3, 1),
                               atol=1e-4, rtol=1e-4)


class TUGATITDisc(tnn.Module):
    def __init__(self, ndf=8, n_layers=5):
        super().__init__()
        convs, norms, d = [], [], ndf
        convs.append(tnn.Conv2d(3, d, 4, 2))
        norms.append(tnn.InstanceNorm2d(d, affine=True))
        for _ in range(n_layers - 3):
            convs.append(tnn.Conv2d(d, d * 2, 4, 2))
            norms.append(tnn.InstanceNorm2d(d * 2, affine=True))
            d *= 2
        convs.append(tnn.Conv2d(d, d * 2, 4, 1))
        norms.append(tnn.InstanceNorm2d(d * 2, affine=True))
        d *= 2
        self.convs = tnn.ModuleList(convs)
        self.norms = tnn.ModuleList(norms)
        self.gap_fc = tnn.Linear(d, 1, bias=False)
        self.gmp_fc = tnn.Linear(d, 1, bias=False)
        self.conv1x1 = tnn.Conv2d(d * 2, d, 1)
        self.head = tnn.Conv2d(d, 1, 4, 1, bias=False)

    def forward(self, x):
        for conv, norm in zip(self.convs, self.norms):
            x = F.leaky_relu(norm(conv(_rp(x, 1))), 0.2)
        gap_logit = self.gap_fc(x.mean((2, 3)))
        gmp_logit = self.gmp_fc(x.amax((2, 3)))
        x = torch.cat([x * self.gap_fc.weight[0][None, :, None, None],
                       x * self.gmp_fc.weight[0][None, :, None, None]], 1)
        x = F.leaky_relu(self.conv1x1(x), 0.2)
        cam_logit = torch.cat([gap_logit, gmp_logit], 1)
        heatmap = x.sum(dim=1, keepdim=True)
        return self.head(_rp(x, 1)), cam_logit, heatmap


def test_ugatit_discriminator_parity(rng):
    from tlxcv_tpu.models.gan.ugatit import UGATITDiscriminator

    tm = TUGATITDisc().eval()
    model = UGATITDiscriminator(ndf=8)
    unmatched = convert_by_order(
        {k: v.detach().numpy() for k, v in tm.state_dict().items()},
        model, source="torch")
    assert not unmatched, unmatched
    x = _x(rng, 32)
    with torch.no_grad():
        ref_out, ref_cam, ref_heat = tm(torch.tensor(x))
    import jax.numpy as jnp

    params, state = split(model)
    (out, cam, heat), _ = pure(model)(params, state,
                                      jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out),
                               ref_out.numpy().transpose(0, 2, 3, 1),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(cam), ref_cam.numpy(), atol=1e-4,
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(heat),
                               ref_heat.numpy().transpose(0, 2, 3, 1),
                               atol=1e-4, rtol=1e-4)
