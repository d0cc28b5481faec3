"""Zoo parity wave 6: transformer zoo — pvt_v2 (SR attention), deit
(distillation token), cswin (cross-shaped stripes + LePE), tnt
(transformer-in-transformer) torch oracles (golden battery -> 27 archs).

Reference architectures: tlxcv/models/classification/{pvt_v2.py,
deit.py, cswin_transformer.py, tnt.py}.  Twin attributes are named to
match the framework modules so convert_by_order's name pass aligns
every parameter.
"""
import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

from tests.test_parity_zoo import _x, roundtrip

torch.manual_seed(5)


class TMlp(tnn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = tnn.Linear(dim, hidden)
        self.fc2 = tnn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x)))


class TMHA(tnn.Module):
    """Packed-QKV MHA twin of nn.attention.MultiHeadAttention."""

    def __init__(self, dim, heads, qkv_bias=False):
        super().__init__()
        self.heads, self.head_dim = heads, dim // heads
        self.qkv = tnn.Linear(dim, dim * 3, bias=qkv_bias)
        self.proj = tnn.Linear(dim, dim)

    def forward(self, x):
        b, n, c = x.shape
        qkv = self.qkv(x).reshape(b, n, 3, self.heads, self.head_dim)
        qkv = qkv.permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q * self.head_dim ** -0.5) @ k.transpose(-2, -1)
        out = attn.softmax(-1) @ v
        return self.proj(out.transpose(1, 2).reshape(b, n, c))


# ------------------------------------------------------------------ pvt_v2
class TSRAttention(tnn.Module):
    def __init__(self, dim, heads, sr_ratio):
        super().__init__()
        self.heads, self.head_dim = heads, dim // heads
        self.q = tnn.Linear(dim, dim)
        self.kv = tnn.Linear(dim, dim * 2)
        self.proj = tnn.Linear(dim, dim)
        self.sr_ratio = sr_ratio
        if sr_ratio > 1:
            self.sr = tnn.Conv2d(dim, dim, sr_ratio, sr_ratio)
            self.norm = tnn.LayerNorm(dim)

    def forward(self, x, hw):
        b, n, c = x.shape
        h, w = hw
        q = self.q(x).reshape(b, n, self.heads, self.head_dim
                              ).permute(0, 2, 1, 3)
        src = x
        if self.sr_ratio > 1:
            src = self.sr(x.reshape(b, h, w, c).permute(0, 3, 1, 2))
            src = self.norm(src.flatten(2).transpose(1, 2))
        kv = self.kv(src).reshape(b, -1, 2, self.heads, self.head_dim)
        kv = kv.permute(2, 0, 3, 1, 4)
        k, v = kv[0], kv[1]
        attn = ((q * self.head_dim ** -0.5) @ k.transpose(-2, -1)).softmax(-1)
        out = (attn @ v).transpose(1, 2).reshape(b, n, c)
        return self.proj(out)


class TMixFFN(tnn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = tnn.Linear(dim, hidden)
        self.dw = tnn.Conv2d(hidden, hidden, 3, 1, 1, groups=hidden)
        self.fc2 = tnn.Linear(hidden, dim)

    def forward(self, x, hw):
        b, n, c = x.shape
        h, w = hw
        y = self.fc1(x)
        y = self.dw(y.reshape(b, h, w, -1).permute(0, 3, 1, 2))
        y = y.permute(0, 2, 3, 1).reshape(b, n, -1)
        return self.fc2(F.gelu(y))


class TPVTBlock(tnn.Module):
    def __init__(self, dim, heads, mlp_ratio, sr_ratio):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim)
        self.attn = TSRAttention(dim, heads, sr_ratio)
        self.norm2 = tnn.LayerNorm(dim)
        self.ffn = TMixFFN(dim, int(dim * mlp_ratio))

    def forward(self, x, hw):
        x = x + self.attn(self.norm1(x), hw)
        return x + self.ffn(self.norm2(x), hw)


class TPVTv2B0(tnn.Module):
    def __init__(self, num_classes=10, dims=(32, 64, 160, 256),
                 depths=(2, 2, 2, 2), heads=(1, 2, 5, 8),
                 sr_ratios=(8, 4, 2, 1), mlp_ratios=(8, 8, 4, 4)):
        super().__init__()
        embeds, norms_in, stages, norms_out, cin = [], [], [], [], 3
        for i, dim in enumerate(dims):
            k, s = (7, 4) if i == 0 else (3, 2)
            embeds.append(tnn.Conv2d(cin, dim, k, s, k // 2))
            norms_in.append(tnn.LayerNorm(dim))
            stages.append(tnn.ModuleList(
                TPVTBlock(dim, heads[i], mlp_ratios[i], sr_ratios[i])
                for _ in range(depths[i])))
            norms_out.append(tnn.LayerNorm(dim))
            cin = dim
        self.embeds = tnn.ModuleList(embeds)
        self.norms_in = tnn.ModuleList(norms_in)
        self.stages = tnn.ModuleList(stages)
        self.norms_out = tnn.ModuleList(norms_out)
        self.head = tnn.Linear(dims[-1], num_classes)

    def forward(self, x):
        for embed, nin, blocks, nout in zip(self.embeds, self.norms_in,
                                            self.stages, self.norms_out):
            x = embed(x)
            b, c, h, w = x.shape
            seq = nin(x.flatten(2).transpose(1, 2))
            for blk in blocks:
                seq = blk(seq, (h, w))
            x = nout(seq).transpose(1, 2).reshape(b, c, h, w)
        return self.head(x.mean(dim=(2, 3)))


def test_pvt_v2_b0_parity(rng):
    from tlxcv_tpu.models.classification import pvt_v2_b0

    roundtrip(TPVTv2B0(), pvt_v2_b0(num_classes=10), _x(rng, 64), atol=5e-4)


# -------------------------------------------------------------------- deit
class TViTBlock(tnn.Module):
    def __init__(self, dim, heads, mlp_ratio=4.0, qkv_bias=True, eps=1e-6):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim, eps=eps)
        self.attn = TMHA(dim, heads, qkv_bias)
        self.norm2 = tnn.LayerNorm(dim, eps=eps)
        self.mlp = TMlp(dim, int(dim * mlp_ratio))

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        return x + self.mlp(self.norm2(x))


class TPatchEmbed(tnn.Module):
    def __init__(self, dim, patch=16):
        super().__init__()
        self.proj = tnn.Conv2d(3, dim, patch, patch)

    def forward(self, x):
        return self.proj(x).flatten(2).transpose(1, 2)


class TDeiTTiny(tnn.Module):
    def __init__(self, num_classes=10, dim=192, depth=4, heads=3,
                 n_patches=16):
        super().__init__()
        self.patch_embed = TPatchEmbed(dim)
        self.pos_embed = tnn.Parameter(torch.randn(1, n_patches + 2, dim)
                                       * 0.02)
        self.cls_token = tnn.Parameter(torch.randn(1, 1, dim) * 0.02)
        self.blocks = tnn.ModuleList(TViTBlock(dim, heads)
                                     for _ in range(depth))
        self.norm = tnn.LayerNorm(dim, eps=1e-6)
        self.head = tnn.Linear(dim, num_classes)
        self.dist_token = tnn.Parameter(torch.randn(1, 1, dim) * 0.02)
        self.head_dist = tnn.Linear(dim, num_classes)

    def forward(self, x):
        b = x.shape[0]
        x = self.patch_embed(x)
        x = torch.cat([self.cls_token.expand(b, -1, -1),
                       self.dist_token.expand(b, -1, -1), x], 1)
        x = x + self.pos_embed
        for blk in self.blocks:
            x = blk(x)
        x = self.norm(x)
        return (self.head(x[:, 0]) + self.head_dist(x[:, 1])) / 2


def test_deit_parity(rng):
    from tlxcv_tpu.models.classification import deit_tiny

    roundtrip(TDeiTTiny(),
              deit_tiny(img_size=64, depth=4, num_classes=10),
              _x(rng, 64), atol=5e-4)


# ------------------------------------------------------------------- cswin
class TLePEAttention(tnn.Module):
    def __init__(self, dim, heads, split, horizontal):
        super().__init__()
        self.heads, self.head_dim = heads, dim // heads
        self.split, self.horizontal = split, horizontal
        self.get_v = tnn.Conv2d(dim, dim, 3, 1, 1, groups=dim)

    def _stripes(self, x, h, w):
        b, s = x.shape[0], self.split
        if self.horizontal:
            return x.reshape(b, h // s, s, w, -1).reshape(
                b * (h // s), s * w, -1)
        x = x.reshape(b, h, w // s, s, -1).permute(0, 2, 1, 3, 4)
        return x.reshape(b * (w // s), h * s, -1)

    def _unstripes(self, x, b, h, w):
        s = self.split
        if self.horizontal:
            return x.reshape(b, h, w, -1)
        x = x.reshape(b, w // s, h, s, -1).permute(0, 2, 1, 3, 4)
        return x.reshape(b, h, w, -1)

    def forward(self, q, k, v, hw):
        h, w = hw
        b = q.shape[0]
        lepe = self.get_v(v.reshape(b, h, w, -1).permute(0, 3, 1, 2))
        lepe = lepe.permute(0, 2, 3, 1)
        qs = self._stripes(q.reshape(b, h, w, -1), h, w)
        ks = self._stripes(k.reshape(b, h, w, -1), h, w)
        vs = self._stripes(v.reshape(b, h, w, -1), h, w)
        bn, n, c = qs.shape

        def heads(t):
            return t.reshape(bn, n, self.heads, self.head_dim
                             ).permute(0, 2, 1, 3)

        attn = ((heads(qs) * self.head_dim ** -0.5)
                @ heads(ks).transpose(-2, -1)).softmax(-1)
        out = (attn @ heads(vs)).transpose(1, 2).reshape(bn, n, c)
        out = self._unstripes(out, b, h, w) + lepe
        return out.reshape(b, h * w, c)


class TCSWinBlock(tnn.Module):
    def __init__(self, dim, heads, split, hw, last=False):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim)
        self.qkv = tnn.Linear(dim, dim * 3)
        self.hw, self.last = hw, last
        if last:
            self.attns = tnn.ModuleList(
                [TLePEAttention(dim, heads, split, True)])
        else:
            self.attns = tnn.ModuleList(
                [TLePEAttention(dim // 2, heads // 2, split, True),
                 TLePEAttention(dim // 2, heads // 2, split, False)])
        self.proj = tnn.Linear(dim, dim)
        self.norm2 = tnn.LayerNorm(dim)
        self.mlp = TMlp(dim, dim * 4)

    def forward(self, x):
        b, n, c = x.shape
        qkv = self.qkv(self.norm1(x)).reshape(b, n, 3, c).permute(2, 0, 1, 3)
        q, k, v = qkv[0], qkv[1], qkv[2]
        if self.last:
            att = self.attns[0](q, k, v, self.hw)
        else:
            qh, qv = q.chunk(2, -1)
            kh, kv_ = k.chunk(2, -1)
            vh, vv = v.chunk(2, -1)
            att = torch.cat([self.attns[0](qh, kh, vh, self.hw),
                             self.attns[1](qv, kv_, vv, self.hw)], -1)
        x = x + self.proj(att)
        return x + self.mlp(self.norm2(x))


class TCSWinMicro(tnn.Module):
    def __init__(self, num_classes=10, embed_dim=64, depths=(1, 1, 2, 1),
                 heads=(2, 4, 8, 16), splits=(1, 2, 7, 7), img=224):
        super().__init__()
        self.stem = tnn.Conv2d(3, embed_dim, 7, 4, 3)
        self.stem_norm = tnn.LayerNorm(embed_dim)
        hw, dim = img // 4, embed_dim
        stages, merges = [], []
        for i, (depth, h) in enumerate(zip(depths, heads)):
            last = i == len(depths) - 1
            stages.append(tnn.ModuleList(
                TCSWinBlock(dim, h, splits[i], (hw, hw), last=last)
                for _ in range(depth)))
            if not last:
                merges.append(tnn.ModuleList(
                    [tnn.Conv2d(dim, dim * 2, 3, 2, 1),
                     tnn.LayerNorm(dim * 2)]))
                dim *= 2
                hw = (hw + 1) // 2
        self.stages = tnn.ModuleList(stages)
        self.merges = tnn.ModuleList(merges)
        self.norm = tnn.LayerNorm(dim)
        self.head = tnn.Linear(dim, num_classes)

    def forward(self, x):
        x = self.stem(x).permute(0, 2, 3, 1)
        b, h, w, c = x.shape
        x = self.stem_norm(x.reshape(b, h * w, c))
        for i, blocks in enumerate(self.stages):
            for blk in blocks:
                x = blk(x)
            if i < len(self.merges):
                conv, norm = self.merges[i]
                x = conv(x.reshape(b, h, w, -1).permute(0, 3, 1, 2))
                x = x.permute(0, 2, 3, 1)
                h, w = x.shape[1:3]
                x = norm(x.reshape(b, h * w, -1))
        return self.head(self.norm(x).mean(1))


def test_cswin_parity(rng):
    from tlxcv_tpu.models.classification.cswin import CSWinTransformer

    model = CSWinTransformer(img_size=224, embed_dim=64,
                             depths=(1, 1, 2, 1), heads=(2, 4, 8, 16),
                             num_classes=10)
    roundtrip(TCSWinMicro(), model, _x(rng, 224, batch=1), atol=5e-4)


# --------------------------------------------------------------------- tnt
class TTNTBlock(tnn.Module):
    def __init__(self, outer_dim, inner_dim, outer_heads, inner_heads,
                 num_pixels, mlp_ratio=4.0):
        super().__init__()
        self.inner_norm1 = tnn.LayerNorm(inner_dim)
        self.inner_attn = TMHA(inner_dim, inner_heads)
        self.inner_norm2 = tnn.LayerNorm(inner_dim)
        self.inner_mlp = TMlp(inner_dim, int(inner_dim * mlp_ratio))
        self.proj_norm1 = tnn.LayerNorm(inner_dim * num_pixels)
        self.proj = tnn.Linear(inner_dim * num_pixels, outer_dim)
        self.proj_norm2 = tnn.LayerNorm(outer_dim)
        self.outer_norm1 = tnn.LayerNorm(outer_dim)
        self.outer_attn = TMHA(outer_dim, outer_heads)
        self.outer_norm2 = tnn.LayerNorm(outer_dim)
        self.outer_mlp = TMlp(outer_dim, int(outer_dim * mlp_ratio))

    def forward(self, pixels, patches):
        pixels = pixels + self.inner_attn(self.inner_norm1(pixels))
        pixels = pixels + self.inner_mlp(self.inner_norm2(pixels))
        b_np, n_pix, c_in = pixels.shape
        b = patches.shape[0]
        flat = pixels.reshape(b, -1, n_pix * c_in)
        upd = self.proj_norm2(self.proj(self.proj_norm1(flat)))
        patches = torch.cat([patches[:, :1], patches[:, 1:] + upd], 1)
        patches = patches + self.outer_attn(self.outer_norm1(patches))
        patches = patches + self.outer_mlp(self.outer_norm2(patches))
        return pixels, patches


class TTNTMicro(tnn.Module):
    def __init__(self, num_classes=10, img=64, patch=16, inner_stride=4,
                 outer_dim=96, inner_dim=24, depth=2, outer_heads=4,
                 inner_heads=4):
        super().__init__()
        self.gh = img // patch
        self.ppp = patch // inner_stride
        n_patches = self.gh ** 2
        n_pixels = self.ppp ** 2
        self.inner_dim, self.outer_dim = inner_dim, outer_dim
        self.pixel_embed = tnn.Conv2d(3, inner_dim, 7, inner_stride, 3)
        self.pixel_pos = tnn.Parameter(
            torch.randn(1, n_pixels, inner_dim) * 0.02)
        self.patch_pos = tnn.Parameter(
            torch.randn(1, n_patches + 1, outer_dim) * 0.02)
        self.cls_token = tnn.Parameter(torch.randn(1, 1, outer_dim) * 0.02)
        self.norm_proj = tnn.LayerNorm(n_pixels * inner_dim)
        self.patch_proj = tnn.Linear(n_pixels * inner_dim, outer_dim)
        self.blocks = tnn.ModuleList(
            TTNTBlock(outer_dim, inner_dim, outer_heads, inner_heads,
                      n_pixels) for _ in range(depth))
        self.norm = tnn.LayerNorm(outer_dim)
        self.head = tnn.Linear(outer_dim, num_classes)

    def forward(self, x):
        b = x.shape[0]
        gh = gw = self.gh
        ppp = self.ppp
        pix = self.pixel_embed(x).permute(0, 2, 3, 1)  # [B, H/s, W/s, inner]
        pix = pix.reshape(b, gh, ppp, gw, ppp, self.inner_dim)
        pix = pix.permute(0, 1, 3, 2, 4, 5).reshape(
            b * gh * gw, ppp * ppp, self.inner_dim)
        pix = pix + self.pixel_pos
        flat = pix.reshape(b, gh * gw, -1)
        patches = self.patch_proj(self.norm_proj(flat))
        patches = torch.cat([self.cls_token.expand(b, -1, -1), patches], 1)
        patches = patches + self.patch_pos
        for blk in self.blocks:
            pix, patches = blk(pix, patches)
        return self.head(self.norm(patches)[:, 0])


def test_tnt_parity(rng):
    from tlxcv_tpu.models.classification.tnt import TNT

    model = TNT(img_size=64, patch_size=16, inner_stride=4, outer_dim=96,
                inner_dim=24, depth=2, outer_heads=4, inner_heads=4,
                num_classes=10)
    roundtrip(TTNTMicro(), model, _x(rng, 64), atol=5e-4)
