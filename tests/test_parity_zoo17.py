"""Zoo parity wave 17: StarGANv2 torch oracles — generator with the
w_hpf masked high-pass skip exercised, mapping network (4+4-layer
topology), style encoder (non-normalized ResBlks) (reference
tlxcv/models/gan/models/generators/generator_starganv2.py).
"""
import math

import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

from tlxcv_tpu.core import pure, split
from tlxcv_tpu.utils.convert import convert_by_order

torch.manual_seed(16)


class TAdaIN(tnn.Module):
    def __init__(self, style_dim, ch):
        super().__init__()
        self.fc = tnn.Linear(style_dim, ch * 2)
        self.norm = tnn.InstanceNorm2d(ch, affine=False)

    def forward(self, x, s):
        h = self.fc(s)[:, :, None, None]
        gamma, beta = h.chunk(2, dim=1)
        return (1 + gamma) * self.norm(x) + beta


class TAdainResBlock(tnn.Module):
    def __init__(self, cin, cout, style_dim, w_hpf=0, upsample=False):
        super().__init__()
        self.upsample, self.w_hpf = upsample, w_hpf
        self.norm1 = TAdaIN(style_dim, cin)
        self.conv1 = tnn.Conv2d(cin, cout, 3, 1, 1)
        self.norm2 = TAdaIN(style_dim, cout)
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1)
        self.skip = tnn.Conv2d(cin, cout, 1, bias=False) \
            if cin != cout else None

    def forward(self, x, s):
        up = (lambda v: F.interpolate(v, scale_factor=2, mode="nearest")) \
            if self.upsample else (lambda v: v)
        y = F.leaky_relu(self.norm1(x, s), 0.2)
        y = self.conv1(up(y))
        y = F.leaky_relu(self.norm2(y, s), 0.2)
        y = self.conv2(y)
        if self.w_hpf != 0:
            return y
        sk = up(x)
        if self.skip is not None:
            sk = self.skip(sk)
        return (y + sk) / math.sqrt(2)


class TResBlock(tnn.Module):
    def __init__(self, cin, cout, normalize=False, downsample=False):
        super().__init__()
        self.downsample = downsample
        self.norm1 = tnn.InstanceNorm2d(cin, affine=True) if normalize \
            else None
        self.conv1 = tnn.Conv2d(cin, cin, 3, 1, 1)
        self.norm2 = tnn.InstanceNorm2d(cin, affine=True) if normalize \
            else None
        self.conv2 = tnn.Conv2d(cin, cout, 3, 1, 1)
        self.skip = tnn.Conv2d(cin, cout, 1, bias=False) \
            if cin != cout else None

    def forward(self, x):
        down = (lambda v: F.avg_pool2d(v, 2, 2)) if self.downsample \
            else (lambda v: v)
        y = x if self.norm1 is None else self.norm1(x)
        y = down(self.conv1(F.leaky_relu(y, 0.2)))
        if self.norm2 is not None:
            y = self.norm2(y)
        y = self.conv2(F.leaky_relu(y, 0.2))
        sk = down(x)
        if self.skip is not None:
            sk = self.skip(sk)
        return (y + sk) / math.sqrt(2)


def t_highpass(x, w_hpf):
    k = torch.tensor([[-1, -1, -1], [-1, 8.0, -1], [-1, -1, -1]]) / w_hpf
    c = x.shape[1]
    return F.conv2d(x, k[None, None].repeat(c, 1, 1, 1), padding=1,
                    groups=c)


class TStarGen(tnn.Module):
    def __init__(self, img_size=32, style_dim=8, max_conv_dim=32, dim_in=8,
                 w_hpf=1):
        super().__init__()
        self.w_hpf = w_hpf
        self.from_rgb = tnn.Conv2d(3, dim_in, 3, 1, 1)
        repeat = int(math.log2(img_size)) - 4 + (1 if w_hpf > 0 else 0)
        repeat = max(repeat, 1)
        encode, decode, d = [], [], dim_in
        for _ in range(repeat):
            dout = min(d * 2, max_conv_dim)
            encode.append(TResBlock(d, dout, normalize=True,
                                    downsample=True))
            decode.insert(0, TAdainResBlock(dout, d, style_dim, w_hpf,
                                            upsample=True))
            d = dout
        for _ in range(2):
            encode.append(TResBlock(d, d, normalize=True))
            decode.insert(0, TAdainResBlock(d, d, style_dim, w_hpf))
        self.encode = tnn.ModuleList(encode)
        self.decode = tnn.ModuleList(decode)
        self.to_rgb_norm = tnn.InstanceNorm2d(dim_in, affine=True)
        self.to_rgb_conv = tnn.Conv2d(dim_in, 3, 1)

    def forward(self, x, s, masks=None):
        x = self.from_rgb(x)
        cache = {}
        for blk in self.encode:
            if masks is not None and x.shape[2] in (32, 64, 128):
                cache[x.shape[2]] = x
            x = blk(x)
        for blk in self.decode:
            x = blk(x, s)
            if masks is not None and x.shape[2] in (32, 64, 128):
                mask = masks[0] if x.shape[2] == 32 else masks[1]
                mask = F.interpolate(mask, size=x.shape[2:],
                                     mode="bilinear", align_corners=False)
                x = x + t_highpass(mask * cache[x.shape[2]], self.w_hpf)
        return self.to_rgb_conv(F.leaky_relu(self.to_rgb_norm(x), 0.2))


def test_starganv2_generator_parity(rng):
    from tlxcv_tpu.models.gan.starganv2 import StarGANv2Generator

    tm = TStarGen().eval()
    model = StarGANv2Generator(img_size=32, style_dim=8, max_conv_dim=32,
                               dim_in=8, w_hpf=1)
    unmatched = convert_by_order(
        {k: v.detach().numpy() for k, v in tm.state_dict().items()},
        model, source="torch")
    assert not unmatched, unmatched
    x = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    s = rng.normal(size=(2, 8)).astype(np.float32)
    m0 = rng.uniform(0, 1, size=(2, 1, 16, 16)).astype(np.float32)
    m1 = rng.uniform(0, 1, size=(2, 1, 16, 16)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(x), torch.tensor(s),
                 [torch.tensor(m0), torch.tensor(m1)]).numpy()
        ref_nomask = tm(torch.tensor(x), torch.tensor(s)).numpy()
    import jax.numpy as jnp

    params, state = split(model)
    out, _ = pure(model)(params, state,
                         jnp.asarray(x.transpose(0, 2, 3, 1)),
                         jnp.asarray(s),
                         masks=[jnp.asarray(m0.transpose(0, 2, 3, 1)),
                                jnp.asarray(m1.transpose(0, 2, 3, 1))])
    np.testing.assert_allclose(np.asarray(out),
                               ref.transpose(0, 2, 3, 1), atol=5e-4,
                               rtol=5e-4)
    out2, _ = pure(model)(params, state,
                          jnp.asarray(x.transpose(0, 2, 3, 1)),
                          jnp.asarray(s))
    np.testing.assert_allclose(np.asarray(out2),
                               ref_nomask.transpose(0, 2, 3, 1), atol=5e-4,
                               rtol=5e-4)


class TMapping(tnn.Module):
    def __init__(self, latent_dim=4, style_dim=8, num_domains=2,
                 hidden=32):
        super().__init__()
        layers = [tnn.Linear(latent_dim, hidden), tnn.ReLU()]
        for _ in range(3):
            layers += [tnn.Linear(hidden, hidden), tnn.ReLU()]
        self.shared = tnn.Sequential(*layers)
        self.heads = tnn.ModuleList(tnn.Sequential(
            tnn.Linear(hidden, hidden), tnn.ReLU(),
            tnn.Linear(hidden, hidden), tnn.ReLU(),
            tnn.Linear(hidden, hidden), tnn.ReLU(),
            tnn.Linear(hidden, style_dim)) for _ in range(num_domains))

    def forward(self, z, y):
        h = self.shared(z)
        styles = torch.stack([head(h) for head in self.heads], 1)
        return styles[torch.arange(z.shape[0]), y]


def test_starganv2_mapping_parity(rng):
    from tlxcv_tpu.models.gan.starganv2 import MappingNetwork

    tm = TMapping().eval()
    model = MappingNetwork(latent_dim=4, style_dim=8, num_domains=2,
                           hidden=32)
    unmatched = convert_by_order(
        {k: v.detach().numpy() for k, v in tm.state_dict().items()},
        model, source="torch")
    assert not unmatched, unmatched
    z = rng.normal(size=(4, 4)).astype(np.float32)
    y = np.asarray([0, 1, 1, 0])
    with torch.no_grad():
        ref = tm(torch.tensor(z), torch.tensor(y)).numpy()
    import jax.numpy as jnp

    params, state = split(model)
    out, _ = pure(model)(params, state, jnp.asarray(z), jnp.asarray(y))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5, rtol=1e-5)


class TStyleEnc(tnn.Module):
    def __init__(self, img_size=32, style_dim=8, num_domains=2, dim_in=8,
                 max_conv_dim=32):
        super().__init__()
        blocks = [tnn.Conv2d(3, dim_in, 3, 1, 1)]
        d = dim_in
        for _ in range(int(math.log2(img_size)) - 2):
            dout = min(d * 2, max_conv_dim)
            blocks.append(TResBlock(d, dout, downsample=True))
            d = dout
        self.blocks = tnn.Sequential(*blocks)
        self.conv = tnn.Conv2d(d, d, 4)
        self.heads = tnn.ModuleList(tnn.Linear(d, style_dim)
                                    for _ in range(num_domains))

    def forward(self, x, y):
        h = self.blocks(x)
        h = F.leaky_relu(self.conv(F.leaky_relu(h, 0.2)), 0.2)
        h = h.reshape(h.shape[0], -1)
        styles = torch.stack([head(h) for head in self.heads], 1)
        return styles[torch.arange(x.shape[0]), y]


def test_starganv2_style_encoder_parity(rng):
    from tlxcv_tpu.models.gan.starganv2 import StyleEncoder

    tm = TStyleEnc().eval()
    model = StyleEncoder(img_size=32, style_dim=8, num_domains=2, dim_in=8,
                         max_conv_dim=32)
    unmatched = convert_by_order(
        {k: v.detach().numpy() for k, v in tm.state_dict().items()},
        model, source="torch")
    assert not unmatched, unmatched
    x = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    y = np.asarray([1, 0])
    with torch.no_grad():
        ref = tm(torch.tensor(x), torch.tensor(y)).numpy()
    import jax.numpy as jnp

    params, state = split(model)
    out, _ = pure(model)(params, state,
                         jnp.asarray(x.transpose(0, 2, 3, 1)),
                         jnp.asarray(y))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4, rtol=1e-4)
