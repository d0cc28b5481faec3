"""Remote-sensing change detection models (reference tlxcv/models/rs/cd/
models/{fc_ef.py, cdnet.py, snunet.py, bit.py, dsifn.py, dsamnet.py,
stanet.py, fccdn.py}), NHWC.

All models share the contract ``model(t1, t2) -> change logits`` at input
resolution (NHWC, [B, H, W, num_classes] — or a distance map for the
metric-learning ones, matching the reference's eval usage).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ... import nn
from ...nn.attention import MultiHeadAttention
from ...ops.image import interpolate
from ..backbones.resnet_vd import resnet18_vd
from ..classification.resnet import ResNet
from .layers import (CBAM, Conv1x1, Conv3x3, Conv7x7, ConvTransposed3x3,
                     MaxPool2x2)

__all__ = ["FCEarlyFusion", "CDNet", "SNUNet", "BIT", "DSIFN", "DSAMNet",
           "STANet", "FCCDN"]


# ------------------------------------------------------------------ FC-EF
class FCEarlyFusion(nn.Module):
    """(reference fc_ef.py:16-144) UNet-ish early-fusion siamese."""

    def __init__(self, in_channels=3, num_classes=2, use_dropout=False):
        C1, C2, C3, C4 = 16, 32, 64, 128
        cin = in_channels * 2
        dp = 0.2 if use_dropout else 0.0
        self.enc = []
        chans = [cin, C1, C2, C3, C4]
        for i in range(4):
            self.enc.append(nn.Sequential(
                Conv3x3(chans[i], chans[i + 1], norm=True, act=True),
                nn.Dropout(dp),
                Conv3x3(chans[i + 1], chans[i + 1], norm=True, act=True),
                nn.Dropout(dp)))
        self.pool = MaxPool2x2()
        self.up = []
        self.dec = []
        dec_in = [C4, C4, C3, C2]
        dec_skip = [C4, C3, C2, C1]
        dec_out = [C4, C3, C2, C1]
        for i in range(4):
            self.up.append(ConvTransposed3x3(dec_in[i] if i == 0 else dec_out[i - 1],
                                             dec_skip[i], norm=True, act=True))
            self.dec.append(nn.Sequential(
                Conv3x3(dec_skip[i] * 2, dec_out[i], norm=True, act=True),
                nn.Dropout(dp),
                Conv3x3(dec_out[i], dec_out[i], norm=True, act=True),
                nn.Dropout(dp)))
        self.head = Conv3x3(C1, num_classes)

    def __call__(self, t1, t2):
        x = jnp.concatenate([t1, t2], -1)
        skips = []
        for enc in self.enc:
            x = enc(x)
            skips.append(x)
            x = self.pool(x)
        # decoder walks skips deepest-first
        for i, (up, dec) in enumerate(zip(self.up, self.dec)):
            x = up(x)
            skip = skips[-(i + 1)]
            x = interpolate(x, size=skip.shape[1:3], mode="nearest") \
                if x.shape[1:3] != skip.shape[1:3] else x
            x = dec(jnp.concatenate([skip, x], -1))
        return self.head(x)


# ------------------------------------------------------------------ CDNet
class CDNet(nn.Module):
    """(reference cdnet.py:13-76) early-fusion conv stack with 7x7 convs."""

    def __init__(self, in_channels=3, num_classes=2):
        cin = in_channels * 2
        self.conv1 = Conv7x7(cin, 64, norm=True, act=True)
        self.convs = [Conv7x7(64, 64, norm=True, act=True) for _ in range(3)]
        self.pool = MaxPool2x2()
        self.ups = [ConvTransposed3x3(64, 64, norm=True, act=True)
                    for _ in range(4)]
        self.head = Conv7x7(64, num_classes)

    def __call__(self, t1, t2):
        x = jnp.concatenate([t1, t2], -1)
        x = self.pool(self.conv1(x))
        for c in self.convs:
            x = self.pool(c(x))
        for up in self.ups:
            x = up(x)
        return self.head(x)


# ----------------------------------------------------------------- SNUNet
class _CBR(nn.Module):
    def __init__(self, cin, cout):
        self.c1 = Conv3x3(cin, cout, norm=True, act=True)
        self.c2 = Conv3x3(cout, cout, norm=True, act=True)

    def __call__(self, x):
        return self.c2(self.c1(x))


class SNUNet(nn.Module):
    """Siamese NestedUNet with channel attention (reference snunet.py:168)."""

    def __init__(self, in_channels=3, num_classes=2, width=8):
        w = [width * (2 ** i) for i in range(5)]
        self.enc = [_CBR(in_channels if i == 0 else w[i - 1], w[i])
                    for i in range(5)]
        self.pool = MaxPool2x2()
        # nested decoder nodes x_{i,j}: input = concat of j skips*2 + up
        self.dec = {}
        for j in range(1, 5):
            for i in range(5 - j):
                # siamese concat (2*w[i]) + prior nested nodes ((j-1)*w[i])
                # + upsampled node from below (2*w[i+1] at j==1, else w[i+1])
                cin = 2 * w[i] + (j - 1) * w[i] + \
                    (2 * w[i + 1] if j == 1 else w[i + 1])
                self.dec[f"{i}_{j}"] = _CBR(cin, w[i])
        self.ca_all = CBAM(w[0] * 4)
        self.head = Conv1x1(w[0] * 4, num_classes)

    def _encode(self, x):
        feats = []
        for i, enc in enumerate(self.enc):
            x = enc(x) if i == 0 else enc(self.pool(x))
            feats.append(x)
        return feats

    def __call__(self, t1, t2):
        f1 = self._encode(t1)
        f2 = self._encode(t2)
        # x[i][0] = concat of siamese features at level i
        nodes = {f"{i}_0": (f1[i], f2[i]) for i in range(5)}
        grid = {}
        for i in range(5):
            grid[f"{i}_0"] = jnp.concatenate([f1[i], f2[i]], -1)
        # for nested nodes use pairwise skip concat
        outs = {}
        for j in range(1, 5):
            for i in range(5 - j):
                below = outs.get(f"{i + 1}_{j - 1}",
                                 grid[f"{i + 1}_0"] if j == 1 else None)
                up = interpolate(below, size=f1[i].shape[1:3], mode="bilinear")
                skips = [grid[f"{i}_0"]] + [outs[f"{i}_{k}"]
                                            for k in range(1, j)]
                outs[f"{i}_{j}"] = self.dec[f"{i}_{j}"](
                    jnp.concatenate(skips + [up], -1))
        final = jnp.concatenate([outs[f"0_{j}"] for j in range(1, 5)], -1)
        return self.head(self.ca_all(final))


# -------------------------------------------------------------------- BIT
class _TransformerLayer(nn.Module):
    def __init__(self, dim, heads, mlp_dim):
        self.norm1 = nn.LayerNorm(dim)
        self.attn = MultiHeadAttention(dim, heads, qkv_bias=True)
        self.norm2 = nn.LayerNorm(dim)
        self.fc1 = nn.Linear(dim, mlp_dim)
        self.fc2 = nn.Linear(mlp_dim, dim)

    def __call__(self, x):
        x = x + self.attn(self.norm1(x))
        return x + self.fc2(nn.gelu(self.fc1(self.norm2(x))))


class _CrossTransformerLayer(nn.Module):
    def __init__(self, dim, heads, mlp_dim):
        from ..detection.detr import DetrAttention

        self.norm1 = nn.LayerNorm(dim)
        self.attn = DetrAttention(dim, heads)
        self.norm2 = nn.LayerNorm(dim)
        self.fc1 = nn.Linear(dim, mlp_dim)
        self.fc2 = nn.Linear(mlp_dim, dim)

    def __call__(self, x, m):
        x = x + self.attn(self.norm1(x), m, m)
        return x + self.fc2(nn.gelu(self.fc1(self.norm2(x))))


class BIT(nn.Module):
    """Bitemporal image transformer (reference bit.py:28-155): resnet18
    backbone, semantic tokens, token transformer + pixel decoder."""

    def __init__(self, in_channels=3, num_classes=2, token_len=4, dim=32,
                 enc_depth=1, dec_depth=8, heads=8):
        self.backbone = ResNet(depth=18, num_classes=0, with_pool=False)
        self.conv_squeeze = Conv3x3(self.backbone.feat_channels[1], dim,
                                    norm=True, act=True)
        self.token_len = token_len
        self.conv_att = Conv1x1(dim, token_len)
        self.encoder = [_TransformerLayer(dim, heads, dim * 2)
                        for _ in range(enc_depth)]
        self.decoder = [_CrossTransformerLayer(dim, heads, dim * 2)
                        for _ in range(dec_depth)]
        self.head = nn.Sequential(
            Conv3x3(dim, dim, norm=True, act=True),
            Conv3x3(dim, num_classes))

    def _features(self, x):
        feats = self.backbone.features(x)[1]  # C3, stride 8
        return self.conv_squeeze(feats)

    def _tokens(self, x):
        b, h, w, c = x.shape
        att = jax.nn.softmax(self.conv_att(x).reshape(b, h * w, self.token_len),
                             axis=1)
        feats = x.reshape(b, h * w, c)
        return jnp.einsum("bnt,bnc->btc", att, feats)

    def __call__(self, t1, t2):
        x1 = self._features(t1)
        x2 = self._features(t2)
        tokens = jnp.concatenate([self._tokens(x1), self._tokens(x2)], 1)
        for layer in self.encoder:
            tokens = layer(tokens)
        tok1, tok2 = jnp.split(tokens, 2, axis=1)
        b, h, w, c = x1.shape

        def decode(x, tok):
            seq = x.reshape(b, h * w, c)
            for layer in self.decoder:
                seq = layer(seq, tok)
            return seq.reshape(b, h, w, c)

        y1 = decode(x1, tok1)
        y2 = decode(x2, tok2)
        diff = jnp.abs(y1 - y2)
        diff = interpolate(diff, size=t1.shape[1:3], mode="bilinear")
        return self.head(diff)


# ------------------------------------------------------------------ DSIFN
class DSIFN(nn.Module):
    """Deeply-supervised image fusion network (reference dsifn.py:198):
    siamese VGG16 encoder + CBAM-fused decoder."""

    def __init__(self, in_channels=3, num_classes=2):
        # VGG-ish siamese encoder (5 stages)
        chans = [32, 64, 128, 256, 256]
        self.stages = []
        cin = in_channels
        for c in chans:
            self.stages.append(nn.Sequential(
                Conv3x3(cin, c, norm=True, act=True),
                Conv3x3(c, c, norm=True, act=True)))
            cin = c
        self.pool = MaxPool2x2()
        self.fuse = []
        self.cbam = []
        prev = 0
        for c in reversed(chans):
            self.cbam.append(CBAM(c * 2 + prev))
            self.fuse.append(nn.Sequential(
                Conv3x3(c * 2 + prev, c, norm=True, act=True),
                Conv3x3(c, c, norm=True, act=True)))
            prev = c
        self.heads = [Conv1x1(c, num_classes) for c in reversed(chans)]

    def _encode(self, x):
        feats = []
        for i, st in enumerate(self.stages):
            if i > 0:
                x = self.pool(x)
            x = st(x)
            feats.append(x)
        return feats

    def __call__(self, t1, t2):
        f1 = self._encode(t1)
        f2 = self._encode(t2)
        out = None
        final = None
        for i in range(4, -1, -1):
            cat = [f1[i], f2[i]] + ([out] if out is not None else [])
            x = jnp.concatenate(cat, -1)
            idx = 4 - i
            x = self.fuse[idx](self.cbam[idx](x))
            final = self.heads[idx](x)
            if i > 0:
                out = interpolate(x, size=f1[i - 1].shape[1:3],
                                  mode="bilinear")
        return interpolate(final, size=t1.shape[1:3], mode="bilinear")


# ----------------------------------------------------------------- DSAMNet
class DSAMNet(nn.Module):
    """Deep siamese attention metric network (reference dsamnet.py):
    resnet18-vd siamese + CBAM; outputs a distance map."""

    def __init__(self, in_channels=3, num_classes=2, ca_ratio=8, sa_kernel=7):
        self.backbone = resnet18_vd(output_stride=32)
        chs = self.backbone.feat_channels  # [64,128,256,512]
        self.conv1 = Conv1x1(chs[0], 64, norm=True, act=True)
        self.conv2 = Conv1x1(chs[1], 64, norm=True, act=True)
        self.cbam1 = CBAM(128, ca_ratio, sa_kernel)
        self.cbam2 = CBAM(128, ca_ratio, sa_kernel)

    def _feat(self, x):
        feats = self.backbone(x)
        f1 = self.conv1(feats[0])
        f2 = interpolate(self.conv2(feats[1]), size=f1.shape[1:3],
                         mode="bilinear")
        return jnp.concatenate([f1, f2], -1)

    def __call__(self, t1, t2):
        f1 = self.cbam1(self._feat(t1))
        f2 = self.cbam2(self._feat(t2))
        dist = jnp.linalg.norm(f1 - f2, axis=-1, keepdims=True)
        return interpolate(dist, size=t1.shape[1:3], mode="bilinear")


# ------------------------------------------------------------------ STANet
class STANet(nn.Module):
    """Spatial-temporal attention network (reference stanet.py:284):
    resnet18 + PAM-style attention over the stacked bitemporal features,
    distance-map output."""

    def __init__(self, in_channels=3, num_classes=2, att_dim=64):
        self.backbone = ResNet(depth=18, num_classes=0, with_pool=False)
        chs = self.backbone.feat_channels
        self.convs = [Conv1x1(c, att_dim, norm=True, act=True) for c in chs]
        self.fuse = Conv3x3(att_dim * 4, att_dim, norm=True, act=True)
        self.attn = MultiHeadAttention(att_dim, 4, qkv_bias=True)

    def _feat(self, x):
        feats = self.backbone.features(x)
        size = feats[0].shape[1:3]
        outs = [self.convs[0](feats[0])]
        for conv, f in zip(self.convs[1:], feats[1:]):
            outs.append(interpolate(conv(f), size=size, mode="bilinear"))
        return self.fuse(jnp.concatenate(outs, -1))

    def __call__(self, t1, t2):
        f1 = self._feat(t1)
        f2 = self._feat(t2)
        b, h, w, c = f1.shape
        seq = jnp.concatenate([f1.reshape(b, h * w, c),
                               f2.reshape(b, h * w, c)], 1)
        seq = seq + self.attn(seq)
        g1 = seq[:, :h * w].reshape(b, h, w, c)
        g2 = seq[:, h * w:].reshape(b, h, w, c)
        dist = jnp.linalg.norm(g1 - g2, axis=-1, keepdims=True)
        return interpolate(dist, size=t1.shape[1:3], mode="bilinear")


# ------------------------------------------------------------------ FCCDN
class FCCDN(nn.Module):
    """Feature-constrained CD network (reference fccdn.py:370): siamese
    encoder, dense fusion decoder, seg aux heads."""

    def __init__(self, in_channels=3, num_classes=2):
        chans = [32, 64, 128, 256]
        self.stages = []
        cin = in_channels
        for c in chans:
            self.stages.append(nn.Sequential(
                Conv3x3(cin, c, norm=True, act=True),
                Conv3x3(c, c, norm=True, act=True)))
            cin = c
        self.pool = MaxPool2x2()
        self.fuse = []
        prev = 0
        for c in reversed(chans):
            self.fuse.append(_CBR(c * 2 + prev, c))
            prev = c
        self.head = Conv1x1(chans[0], num_classes)
        self.seg_head = Conv1x1(chans[0], 1)

    def _encode(self, x):
        feats = []
        for i, st in enumerate(self.stages):
            if i > 0:
                x = self.pool(x)
            x = st(x)
            feats.append(x)
        return feats

    def __call__(self, t1, t2):
        from ...core.module import is_training

        f1 = self._encode(t1)
        f2 = self._encode(t2)
        out = None
        for i in range(3, -1, -1):
            cat = [f1[i], f2[i]] + ([out] if out is not None else [])
            x = self.fuse[3 - i](jnp.concatenate(cat, -1))
            if i > 0:
                out = interpolate(x, size=f1[i - 1].shape[1:3],
                                  mode="bilinear")
        change = self.head(x)
        if is_training():
            return [change, self.seg_head(x), self.seg_head(x)]
        return change
