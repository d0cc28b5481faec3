"""Zoo parity wave 14: StyleGANv2 generator AND discriminator torch
oracles (rosinality-layout twins) — full-model verification of the
modulated-conv / upfirdn2d / equalized-lr stack (reference
tlxcv/models/gan/models/{generator_styleganv2.py,
discriminator_styleganv2.py}); the bricks were torch-verified
individually in round 1, this closes the composition.
"""
import math

import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

from tlxcv_tpu.core import pure, split
from tlxcv_tpu.utils.convert import convert_by_order

torch.manual_seed(13)


def t_upfirdn2d(x, kernel, up=1, down=1, pad=(0, 0)):
    """NCHW torch mirror of ops upfirdn2d (zero-insert, pad, FIR,
    stride)."""
    n, c, h, w = x.shape
    if up > 1:
        x = x.reshape(n, c, h, 1, w, 1)
        x = F.pad(x, (0, up - 1, 0, 0, 0, up - 1))
        x = x.reshape(n, c, h * up, w * up)
    p0, p1 = pad
    x = F.pad(x, (max(p0, 0), max(p1, 0), max(p0, 0), max(p1, 0)))
    if p0 < 0 or p1 < 0:
        x = x[:, :, max(-p0, 0):x.shape[2] - max(-p1, 0),
              max(-p0, 0):x.shape[3] - max(-p1, 0)]
    k = torch.flip(kernel, (0, 1))[None, None].repeat(c, 1, 1, 1)
    x = F.conv2d(x, k, groups=c)
    if down > 1:
        x = x[:, :, ::down, ::down]
    return x


def _blur_kernel(k=(1, 3, 3, 1)):
    k = torch.tensor(k, dtype=torch.float32)
    k = torch.outer(k, k)
    return k / k.sum()


def t_fused_lrelu(x, bias=None, slope=0.2, scale=2 ** 0.5):
    if bias is not None:
        shape = [1] * x.ndim
        shape[1] = -1
        x = x + bias.reshape(shape)
    return F.leaky_relu(x, slope) * scale


class TEqualLinear(tnn.Module):
    def __init__(self, in_dim, out_dim, bias_init=0.0, lr_mul=1.0,
                 activation=None):
        super().__init__()
        self.weight = tnn.Parameter(torch.randn(out_dim, in_dim) / lr_mul)
        self.bias = tnn.Parameter(torch.full((out_dim,), bias_init))
        self.scale = 1 / math.sqrt(in_dim) * lr_mul
        self.lr_mul = lr_mul
        self.activation = activation

    def forward(self, x):
        y = F.linear(x, self.weight * self.scale)
        b = self.bias * self.lr_mul
        if self.activation == "fused_lrelu":
            return t_fused_lrelu(y, b) if y.ndim > 1 else y
        return y + b


class TEqualConv2d(tnn.Module):
    def __init__(self, cin, cout, k, stride=1, padding=0, bias=True):
        super().__init__()
        self.weight = tnn.Parameter(torch.randn(cout, cin, k, k))
        self.scale = 1 / math.sqrt(cin * k * k)
        self.stride, self.padding = stride, padding
        self.bias = tnn.Parameter(torch.zeros(cout)) if bias else None

    def forward(self, x):
        return F.conv2d(x, self.weight * self.scale, self.bias,
                        self.stride, self.padding)


class TModulatedConv2d(tnn.Module):
    def __init__(self, cin, cout, k, style_dim, demodulate=True,
                 upsample=False, blur_kernel=(1, 3, 3, 1)):
        super().__init__()
        self.k, self.demodulate, self.upsample = k, demodulate, upsample
        self.cin, self.cout = cin, cout
        self.scale = 1 / math.sqrt(cin * k * k)
        self.weight = tnn.Parameter(torch.randn(cout, cin, k, k))
        self.modulation = TEqualLinear(style_dim, cin, bias_init=1.0)
        if upsample:
            p = len(blur_kernel) - 2 - (k - 1)
            self.blur_pad = ((p + 1) // 2 + 1, p // 2 + 1)
            self.register_buffer("blur_k", _blur_kernel(blur_kernel) * 4)

    def forward(self, x, style):
        b, cin, h, w = x.shape
        k = self.k
        style = self.modulation(style)                     # [B, cin]
        w_ = self.weight * self.scale                      # [cout, cin, k, k]
        wmod = w_[None] * style[:, None, :, None, None]    # [B,cout,cin,k,k]
        if self.demodulate:
            demod = torch.rsqrt((wmod ** 2).sum(dim=(2, 3, 4)) + 1e-8)
            wmod = wmod * demod[:, :, None, None, None]
        if self.upsample:
            wt = wmod.transpose(1, 2).reshape(b * cin, self.cout, k, k)
            xg = x.reshape(1, b * cin, h, w)
            y = F.conv_transpose2d(xg, wt, stride=2, padding=0, groups=b)
            y = y.reshape(b, self.cout, y.shape[2], y.shape[3])
            # conv_transpose2d k3 s2 p0 output = 2h+1; ours (lhs-dilated,
            # full padding) gives 2h+1 too before blur crop; blur pads
            # asymmetrically to land on 2h
            return t_upfirdn2d(y, self.blur_k, pad=self.blur_pad)
        wg = wmod.reshape(b * self.cout, cin, k, k)
        xg = x.reshape(1, b * cin, h, w)
        y = F.conv2d(xg, wg, padding=k // 2, groups=b)
        return y.reshape(b, self.cout, h, w)


class TNoise(tnn.Module):
    def __init__(self):
        super().__init__()
        self.weight = tnn.Parameter(torch.zeros(1))

    def forward(self, x):
        return x  # deterministic eval: framework skips noise with no rngs


class TStyledConv(tnn.Module):
    def __init__(self, cin, cout, k, style_dim, upsample=False):
        super().__init__()
        self.conv = TModulatedConv2d(cin, cout, k, style_dim,
                                     upsample=upsample)
        self.noise = TNoise()
        self.act_bias = tnn.Parameter(torch.zeros(cout))

    def forward(self, x, style):
        return t_fused_lrelu(self.noise(self.conv(x, style)), self.act_bias)


class TToRGB(tnn.Module):
    def __init__(self, cin, style_dim, upsample=True):
        super().__init__()
        self.conv = TModulatedConv2d(cin, 3, 1, style_dim, demodulate=False)
        self.bias = tnn.Parameter(torch.zeros(3))
        self.upsample = upsample
        if upsample:
            self.register_buffer("blur_k", _blur_kernel() * 4)
            p = 4 - 2
            self.pad = ((p + 1) // 2 + 1, p // 2)

    def forward(self, x, style, skip=None):
        out = self.conv(x, style) + self.bias[None, :, None, None]
        if skip is not None:
            if self.upsample:
                skip = t_upfirdn2d(skip, self.blur_k, up=2, pad=self.pad)
            out = out + skip
        return out


class TStyleGAN2G(tnn.Module):
    def __init__(self, size=16, style_dim=64, n_mlp=2):
        super().__init__()
        self.style = tnn.ModuleList(
            [tnn.Identity()] +  # PixelNorm slot (no params)
            [TEqualLinear(style_dim, style_dim, lr_mul=0.01,
                          activation="fused_lrelu") for _ in range(n_mlp)])
        ch = {4: 512, 8: 512, 16: 512}
        # stored NHWC directly so the converter maps it 1:1
        self.input_const = tnn.Parameter(torch.randn(1, 4, 4, ch[4]))
        self.conv1 = TStyledConv(ch[4], ch[4], 3, style_dim)
        self.to_rgb1 = TToRGB(ch[4], style_dim, upsample=False)
        convs, to_rgbs, cin = [], [], ch[4]
        for i in range(3, int(math.log2(size)) + 1):
            cout = ch[2 ** i]
            convs.append(TStyledConv(cin, cout, 3, style_dim, upsample=True))
            convs.append(TStyledConv(cout, cout, 3, style_dim))
            to_rgbs.append(TToRGB(cout, style_dim))
            cin = cout
        self.convs = tnn.ModuleList(convs)
        self.to_rgbs = tnn.ModuleList(to_rgbs)

    def forward(self, z):
        w = z * torch.rsqrt((z * z).mean(-1, keepdim=True) + 1e-8)
        for layer in self.style[1:]:
            w = layer(w)
        b = w.shape[0]
        x = self.input_const.permute(0, 3, 1, 2).expand(b, -1, -1, -1)
        x = self.conv1(x, w)
        skip = self.to_rgb1(x, w)
        for i in range(0, len(self.convs), 2):
            x = self.convs[i](x, w)
            x = self.convs[i + 1](x, w)
            skip = self.to_rgbs[i // 2](x, w, skip)
        return skip


def test_styleganv2_generator_parity(rng):
    from tlxcv_tpu.models.gan.styleganv2 import StyleGANv2Generator

    tm = TStyleGAN2G().eval()
    model = StyleGANv2Generator(size=16, style_dim=64, n_mlp=2)
    unmatched = convert_by_order(
        {k: v.detach().numpy() for k, v in tm.state_dict().items()},
        model, source="torch")
    assert not unmatched, unmatched
    z = rng.normal(size=(2, 64)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(z)).numpy()
    import jax.numpy as jnp

    params, state = split(model)
    out, _ = pure(model)(params, state, jnp.asarray(z))
    np.testing.assert_allclose(np.asarray(out),
                               ref.transpose(0, 2, 3, 1), atol=2e-3,
                               rtol=2e-3)


class TDiscBlock(tnn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv1 = TEqualConv2d(cin, cin, 3, padding=1)
        self.b1 = tnn.Parameter(torch.zeros(cin))
        self.register_buffer("blur_k", _blur_kernel())
        self.conv2 = TEqualConv2d(cin, cout, 3, stride=2, padding=0)
        self.b2 = tnn.Parameter(torch.zeros(cout))
        self.skip = TEqualConv2d(cin, cout, 1, stride=2, bias=False)

    def forward(self, x):
        out = t_fused_lrelu(self.conv1(x), self.b1)
        out = t_fused_lrelu(self.conv2(
            t_upfirdn2d(out, self.blur_k, pad=(2, 2))), self.b2)
        sk = self.skip(t_upfirdn2d(x, self.blur_k, pad=(1, 1)))
        return (out + sk) / math.sqrt(2)


class TStyleGAN2D(tnn.Module):
    def __init__(self, size=16):
        super().__init__()
        ch = {4: 512, 8: 512, 16: 512}
        self.stem = TEqualConv2d(3, ch[size], 1)
        self.stem_b = tnn.Parameter(torch.zeros(ch[size]))
        blocks, cin = [], ch[size]
        for i in range(int(math.log2(size)), 2, -1):
            cout = ch[2 ** (i - 1)]
            blocks.append(TDiscBlock(cin, cout))
            cin = cout
        self.blocks = tnn.ModuleList(blocks)
        self.final_conv = TEqualConv2d(cin + 1, ch[4], 3, padding=1)
        self.final_b = tnn.Parameter(torch.zeros(ch[4]))
        self.final_linear1 = TEqualLinear(ch[4] * 16, ch[4],
                                          activation="fused_lrelu")
        self.final_linear2 = TEqualLinear(ch[4], 1)

    def forward(self, x):
        x = t_fused_lrelu(self.stem(x), self.stem_b)
        for blk in self.blocks:
            x = blk(x)
        b, c, h, w = x.shape
        std = x.std(dim=0, unbiased=False, keepdim=True).mean()
        std_map = torch.full((b, 1, h, w), float(std))
        x = torch.cat([x, std_map], 1)
        x = t_fused_lrelu(self.final_conv(x), self.final_b)
        # flatten in NHWC order to match the framework's reshape
        x = x.permute(0, 2, 3, 1).reshape(b, -1)
        return self.final_linear2(self.final_linear1(x))


def test_styleganv2_discriminator_parity(rng):
    from tlxcv_tpu.models.gan.styleganv2 import StyleGANv2Discriminator

    tm = TStyleGAN2D().eval()
    model = StyleGANv2Discriminator(size=16)
    unmatched = convert_by_order(
        {k: v.detach().numpy() for k, v in tm.state_dict().items()},
        model, source="torch")
    assert not unmatched, unmatched
    x = rng.normal(size=(2, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(x)).numpy()
    import jax.numpy as jnp

    params, state = split(model)
    out, _ = pure(model)(params, state,
                         jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-3, rtol=2e-3)
