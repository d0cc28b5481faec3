"""Zoo parity wave 22: wing FAN (coord conv + hourglass facial heatmaps)
and DCGAN generator/discriminator torch oracles (reference
tlxcv/models/gan/models/layers/wing.py, dcdiscriminator.py /
generater dcgenerator) — closes oracle coverage of the GAN directory.
"""
import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

from tests.test_parity_zoo import _randomize_bn
from tlxcv_tpu.core import pure, split
from tlxcv_tpu.utils.convert import convert_by_order

torch.manual_seed(21)


def _convert(tm, model):
    unmatched = convert_by_order(
        {k: v.detach().numpy() for k, v in tm.eval().state_dict().items()},
        model, source="torch")
    assert not unmatched, unmatched


# --------------------------------------------------------------------- fan
def _t_coords(x, with_r=True):
    b, _, h, w = x.shape
    rows = (torch.arange(h, dtype=torch.float32) / (h - 1) * 2 - 1)
    cols = (torch.arange(w, dtype=torch.float32) / (w - 1) * 2 - 1)
    row_m = rows[:, None].expand(h, w)
    col_m = cols[None, :].expand(h, w)
    feats = [x, row_m[None, None].expand(b, 1, h, w),
             col_m[None, None].expand(b, 1, h, w)]
    if with_r:
        rr = torch.sqrt(row_m ** 2 + col_m ** 2)
        rr = rr / rr.max()
        feats.append(rr[None, None].expand(b, 1, h, w))
    return torch.cat(feats, 1)


class TCoordConv(tnn.Module):
    def __init__(self, cin, cout, k=3, stride=1, padding=1, with_r=False):
        super().__init__()
        self.with_r = with_r
        self.conv = tnn.Conv2d(cin + 2 + int(with_r), cout, k, stride,
                               padding)

    def forward(self, x):
        return self.conv(_t_coords(x, self.with_r))


class TWConvBlock(tnn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        half, quarter = cout // 2, cout // 4
        self.bn1 = tnn.BatchNorm2d(cin)
        self.conv1 = tnn.Conv2d(cin, half, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(half)
        self.conv2 = tnn.Conv2d(half, quarter, 3, 1, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(quarter)
        self.conv3 = tnn.Conv2d(quarter, cout - half - quarter, 3, 1, 1,
                                bias=False)
        self.down = None
        if cin != cout:
            self.down = tnn.Sequential(
                tnn.BatchNorm2d(cin), tnn.ReLU(),
                tnn.Conv2d(cin, cout, 1, bias=False))

    def forward(self, x):
        y1 = self.conv1(torch.relu(self.bn1(x)))
        y2 = self.conv2(torch.relu(self.bn2(y1)))
        y3 = self.conv3(torch.relu(self.bn3(y2)))
        out = torch.cat([y1, y2, y3], 1)
        return out + (x if self.down is None else self.down(x))


class THourGlass(tnn.Module):
    def __init__(self, depth, features):
        super().__init__()
        self.depth = depth
        self.b1 = tnn.ModuleList(TWConvBlock(features, features)
                                 for _ in range(depth))
        self.b2 = tnn.ModuleList(TWConvBlock(features, features)
                                 for _ in range(depth))
        self.b3 = tnn.ModuleList(TWConvBlock(features, features)
                                 for _ in range(depth))
        self.mid = TWConvBlock(features, features)

    def _fwd(self, level, x):
        up1 = self.b1[level - 1](x)
        low = F.avg_pool2d(x, 2, 2)
        low = self.b2[level - 1](low)
        low = self._fwd(level - 1, low) if level > 1 else self.mid(low)
        low = self.b3[level - 1](low)
        up2 = F.interpolate(low, size=up1.shape[2:], mode="nearest")
        return up1 + up2

    def forward(self, x):
        return self._fwd(self.depth, x)


class TFAN(tnn.Module):
    def __init__(self, num_landmarks=10, channels=16, hg_depth=2):
        super().__init__()
        self.stem = TCoordConv(3, channels, 7, 2, 3, with_r=True)
        self.bn1 = tnn.BatchNorm2d(channels)
        self.block1 = TWConvBlock(channels, channels * 2)
        self.block2 = TWConvBlock(channels * 2, channels * 2)
        self.hg = THourGlass(hg_depth, channels * 2)
        self.post = TWConvBlock(channels * 2, channels * 2)
        self.head = tnn.Conv2d(channels * 2, num_landmarks, 1)

    def forward(self, x):
        x = torch.relu(self.bn1(self.stem(x)))
        x = F.avg_pool2d(self.block1(x), 2, 2)
        x = self.block2(x)
        x = self.post(self.hg(x))
        return self.head(x)


def test_fan_parity(rng):
    from tlxcv_tpu.models.gan.wing import FAN

    tm = TFAN()
    _randomize_bn(tm)
    model = FAN(num_landmarks=10, channels=16, hg_depth=2)
    _convert(tm, model)
    x = rng.normal(size=(1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(x)).numpy()
    import jax.numpy as jnp

    params, state = split(model)
    out, _ = pure(model)(params, state,
                         jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out),
                               ref.transpose(0, 2, 3, 1), atol=5e-4,
                               rtol=5e-4)


# ------------------------------------------------------------------- dcgan
class TDCGen(tnn.Module):
    def __init__(self, nz=16, ngf=8):
        super().__init__()
        self.net = tnn.Sequential(
            tnn.ConvTranspose2d(nz, ngf * 8, 4, 1, bias=False),
            tnn.BatchNorm2d(ngf * 8), tnn.ReLU(),
            tnn.ConvTranspose2d(ngf * 8, ngf * 4, 4, 2, 1, bias=False),
            tnn.BatchNorm2d(ngf * 4), tnn.ReLU(),
            tnn.ConvTranspose2d(ngf * 4, ngf * 2, 4, 2, 1, bias=False),
            tnn.BatchNorm2d(ngf * 2), tnn.ReLU(),
            tnn.ConvTranspose2d(ngf * 2, ngf, 4, 2, 1, bias=False),
            tnn.BatchNorm2d(ngf), tnn.ReLU(),
            tnn.ConvTranspose2d(ngf, 3, 4, 2, 1, bias=False), tnn.Tanh())

    def forward(self, z):
        return self.net(z)


class TDCDisc(tnn.Module):
    def __init__(self, ndf=8):
        super().__init__()

        def block(cin, cout, bn=True):
            layers = [tnn.Conv2d(cin, cout, 4, 2, 1, bias=False)]
            if bn:
                layers.append(tnn.BatchNorm2d(cout))
            layers.append(tnn.LeakyReLU(0.2))
            return layers

        self.net = tnn.Sequential(
            *block(3, ndf, bn=False), *block(ndf, ndf * 2),
            *block(ndf * 2, ndf * 4), *block(ndf * 4, ndf * 8),
            tnn.Conv2d(ndf * 8, 1, 4, 1, bias=False))

    def forward(self, x):
        return self.net(x)


def test_dcgan_parity(rng):
    from tlxcv_tpu.models.gan.dcgan import DCDiscriminator, DCGenerator

    tg = TDCGen()
    _randomize_bn(tg)
    g = DCGenerator(input_nz=16, ngf=8)
    _convert(tg, g)
    z = rng.normal(size=(2, 16, 1, 1)).astype(np.float32)
    with torch.no_grad():
        ref = tg(torch.tensor(z)).numpy()
    import jax.numpy as jnp

    pg, sg = split(g)
    out, _ = pure(g)(pg, sg, jnp.asarray(z.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out),
                               ref.transpose(0, 2, 3, 1), atol=1e-4,
                               rtol=1e-4)

    td = TDCDisc()
    _randomize_bn(td)
    d = DCDiscriminator(ndf=8)
    _convert(td, d)
    x = rng.normal(size=(2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        refd = td(torch.tensor(x)).numpy()
    pd, sd = split(d)
    outd, _ = pure(d)(pd, sd, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(outd),
                               refd.transpose(0, 2, 3, 1), atol=1e-4,
                               rtol=1e-4)
