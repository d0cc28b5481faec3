"""Zoo-scale golden parity: torch oracle twins -> convert_by_order -> our
models; forward outputs must match to ~1e-4 (VERDICT r1 next-round #3).

This replaces the reference's README parity tables
(/root/reference/README.md:30-143) in a no-weights environment: each
torch twin is hand-built to the reference architecture, weights are
converted with the same machinery a real .pdparams/.pth would use, and
the forward diff is the pass criterion.  One test per family:
deep CNN (resnet50), depthwise+SE (mobilenet_v3), convnext, swin,
levit, twins/gvt (wave 1); seg/rs/face/pose twins live in
test_parity_zoo2.py (wave 2).
"""
import itertools

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn

from tlxcv_tpu.core import pure, split
from tlxcv_tpu.utils.convert import convert_by_order

torch.manual_seed(0)


def _randomize_bn(tmodel):
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, (tnn.BatchNorm1d, tnn.BatchNorm2d)):
                m.running_mean.copy_(torch.randn_like(m.running_mean) * 0.1)
                m.running_var.copy_(torch.rand_like(m.running_var) + 0.5)


def roundtrip(tmodel, model, x_nchw, atol=2e-4):
    """torch state_dict -> convert_by_order -> forward diff."""
    tmodel = tmodel.eval()
    _randomize_bn(tmodel)
    unmatched = convert_by_order(
        {k: v.detach().numpy() for k, v in tmodel.state_dict().items()},
        model, source="torch")
    assert not unmatched, unmatched
    with torch.no_grad():
        ref = tmodel(torch.tensor(x_nchw)).numpy()
    params, state = split(model)
    out, _ = pure(model)(params, state,
                         jnp.asarray(np.transpose(x_nchw, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.asarray(out), ref, atol=atol, rtol=atol)
    return np.max(np.abs(np.asarray(out) - ref))


def _x(rng, size, batch=2):
    return rng.normal(size=(batch, 3, size, size)).astype(np.float32)


# ---------------------------------------------------------------- resnet50
class TorchBottleneck(tnn.Module):
    expansion = 4

    def __init__(self, cin, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.downsample = downsample

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        out = torch.relu(self.bn1(self.conv1(x)))
        out = torch.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return torch.relu(out + idn)


class TorchResNet50(tnn.Module):
    def __init__(self, num_classes=10):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        cin = 64

        def layer(planes, blocks, stride):
            nonlocal cin
            down = tnn.Sequential(
                tnn.Conv2d(cin, planes * 4, 1, stride, bias=False),
                tnn.BatchNorm2d(planes * 4))
            mods = [TorchBottleneck(cin, planes, stride, down)]
            cin = planes * 4
            mods += [TorchBottleneck(cin, planes) for _ in range(blocks - 1)]
            return tnn.Sequential(*mods)

        self.layer1 = layer(64, 3, 1)
        self.layer2 = layer(128, 4, 2)
        self.layer3 = layer(256, 6, 2)
        self.layer4 = layer(512, 3, 2)
        self.fc = tnn.Linear(2048, num_classes)

    def forward(self, x):
        x = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        return self.fc(x.mean(dim=(2, 3)))


def test_resnet50_parity(rng):
    from tlxcv_tpu.models import resnet50

    roundtrip(TorchResNet50(10), resnet50(num_classes=10), _x(rng, 64))


# ---------------------------------------------------- mobilenet_v3_small
class TorchSE(tnn.Module):
    def __init__(self, ch, mid):
        super().__init__()
        self.fc1 = tnn.Conv2d(ch, mid, 1)
        self.fc2 = tnn.Conv2d(mid, ch, 1)

    def forward(self, x):
        s = x.mean(dim=(2, 3), keepdim=True)
        s = torch.relu(self.fc1(s))
        s = tnn.functional.hardsigmoid(self.fc2(s))
        return x * s


class TorchBneck(tnn.Module):
    def __init__(self, cin, exp, cout, k, stride, use_se, act):
        super().__init__()
        self.use_res = stride == 1 and cin == cout
        self.expand = exp != cin
        if self.expand:
            self.conv1 = tnn.Conv2d(cin, exp, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(exp)
        self.conv2 = tnn.Conv2d(exp, exp, k, stride, k // 2, groups=exp,
                                bias=False)
        self.bn2 = tnn.BatchNorm2d(exp)
        from tlxcv_tpu.models.classification.utils import make_divisible
        self.se = TorchSE(exp, make_divisible(exp // 4, 8)) if use_se else None
        self.conv3 = tnn.Conv2d(exp, cout, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(cout)
        self.act = (torch.relu if act == "relu"
                    else tnn.functional.hardswish)

    def forward(self, x):
        out = x
        if self.expand:
            out = self.act(self.bn1(self.conv1(out)))
        out = self.act(self.bn2(self.conv2(out)))
        if self.se is not None:
            out = self.se(out)
        out = self.bn3(self.conv3(out))
        return x + out if self.use_res else out


class TorchMobileNetV3Small(tnn.Module):
    CFG = [(3, 16, 16, True, "relu", 2), (3, 72, 24, False, "relu", 2),
           (3, 88, 24, False, "relu", 1), (5, 96, 40, True, "hardswish", 2),
           (5, 240, 40, True, "hardswish", 1), (5, 240, 40, True, "hardswish", 1),
           (5, 120, 48, True, "hardswish", 1), (5, 144, 48, True, "hardswish", 1),
           (5, 288, 96, True, "hardswish", 2), (5, 576, 96, True, "hardswish", 1),
           (5, 576, 96, True, "hardswish", 1)]

    def __init__(self, num_classes=10):
        super().__init__()
        self.stem_conv = tnn.Conv2d(3, 16, 3, 2, 1, bias=False)
        self.stem_bn = tnn.BatchNorm2d(16)
        blocks, cin = [], 16
        for k, exp, out, se, act, s in self.CFG:
            blocks.append(TorchBneck(cin, exp, out, k, s, se, act))
            cin = out
        self.blocks = tnn.ModuleList(blocks)
        self.last_conv = tnn.Conv2d(cin, 576, 1, bias=False)
        self.last_bn = tnn.BatchNorm2d(576)
        self.classifier = tnn.Sequential(
            tnn.Linear(576, 1280), tnn.Hardswish(), tnn.Dropout(0.2),
            tnn.Linear(1280, num_classes))

    def forward(self, x):
        x = tnn.functional.hardswish(self.stem_bn(self.stem_conv(x)))
        for b in self.blocks:
            x = b(x)
        x = tnn.functional.hardswish(self.last_bn(self.last_conv(x)))
        return self.classifier(x.mean(dim=(2, 3)))


def test_mobilenet_v3_small_parity(rng):
    from tlxcv_tpu.models.classification import mobilenet_v3_small

    roundtrip(TorchMobileNetV3Small(10),
              mobilenet_v3_small(num_classes=10), _x(rng, 64))


# ------------------------------------------------------------- convnext
class TorchConvNeXtBlock(tnn.Module):
    def __init__(self, dim, ls=1e-6):
        super().__init__()
        self.dwconv = tnn.Conv2d(dim, dim, 7, padding=3, groups=dim)
        self.norm = tnn.LayerNorm(dim, eps=1e-6)
        self.pwconv1 = tnn.Linear(dim, 4 * dim)
        self.pwconv2 = tnn.Linear(4 * dim, dim)
        self.gamma = tnn.Parameter(ls * torch.ones(dim))

    def forward(self, x):
        y = self.dwconv(x).permute(0, 2, 3, 1)
        y = self.norm(y)
        y = self.pwconv2(tnn.functional.gelu(self.pwconv1(y)))
        y = (self.gamma * y).permute(0, 3, 1, 2)
        return x + y


class TorchConvNeXt(tnn.Module):
    def __init__(self, depths=(1, 1, 2, 1), dims=(16, 32, 64, 128),
                 num_classes=10):
        super().__init__()
        class LN2d(tnn.LayerNorm):
            def forward(self, x):
                return super().forward(
                    x.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)

        downs = [tnn.Sequential(tnn.Conv2d(3, dims[0], 4, 4),
                                LN2d(dims[0], eps=1e-6))]
        for i in range(3):
            downs.append(tnn.Sequential(LN2d(dims[i], eps=1e-6),
                                        tnn.Conv2d(dims[i], dims[i + 1], 2, 2)))
        self.downsample = tnn.ModuleList(downs)
        self.stages = tnn.ModuleList(
            tnn.ModuleList(TorchConvNeXtBlock(dims[i]) for _ in range(d))
            for i, d in enumerate(depths))
        self.norm = tnn.LayerNorm(dims[-1], eps=1e-6)
        self.head = tnn.Linear(dims[-1], num_classes)

    def forward(self, x):
        for down, blocks in zip(self.downsample, self.stages):
            x = down(x)
            for blk in blocks:
                x = blk(x)
        return self.head(self.norm(x.mean(dim=(2, 3))))


def test_convnext_parity(rng):
    from tlxcv_tpu.models.classification import ConvNeXt

    model = ConvNeXt(depths=(1, 1, 2, 1), dims=(16, 32, 64, 128),
                     num_classes=10)
    roundtrip(TorchConvNeXt(), model, _x(rng, 64), atol=5e-4)


# ----------------------------------------------------------------- swin
class TorchWindowAttention(tnn.Module):
    def __init__(self, dim, ws, num_heads):
        super().__init__()
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.scale = self.head_dim ** -0.5
        self.ws = ws
        self.qkv = tnn.Linear(dim, dim * 3)
        self.proj = tnn.Linear(dim, dim)
        self.rel_bias = tnn.Parameter(
            torch.randn((2 * ws - 1) ** 2, num_heads) * 0.02)
        coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                      indexing="ij")).reshape(2, -1)
        rel = coords[:, :, None] - coords[:, None, :]
        rel = rel.transpose(1, 2, 0) + ws - 1
        self.rel_index = torch.tensor(
            (rel[..., 0] * (2 * ws - 1) + rel[..., 1]).astype(np.int64))

    def forward(self, x, mask=None):
        bn, n, c = x.shape
        qkv = self.qkv(x).reshape(bn, n, 3, self.num_heads, self.head_dim)
        qkv = qkv.permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q * self.scale) @ k.transpose(-2, -1)
        bias = self.rel_bias[self.rel_index.reshape(-1)].reshape(
            n, n, self.num_heads).permute(2, 0, 1)
        attn = attn + bias.unsqueeze(0)
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.view(bn // nw, nw, self.num_heads, n, n)
            attn = attn + mask.unsqueeze(0).unsqueeze(2)
            attn = attn.view(bn, self.num_heads, n, n)
        attn = attn.softmax(dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(bn, n, c)
        return self.proj(out)


class TorchMlp(tnn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = tnn.Linear(dim, hidden)
        self.fc2 = tnn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(tnn.functional.gelu(self.fc1(x)))


class TorchSwinBlock(tnn.Module):
    def __init__(self, dim, hw, heads, ws, shift):
        super().__init__()
        h, w = hw
        self.hw = hw
        if min(h, w) <= ws:
            ws, shift = min(h, w), 0
        self.ws, self.shift = ws, shift
        self.norm1 = tnn.LayerNorm(dim)
        self.attn = TorchWindowAttention(dim, ws, heads)
        self.norm2 = tnn.LayerNorm(dim)
        self.mlp = TorchMlp(dim, dim * 4)
        if shift > 0:
            img = np.zeros((1, h, w, 1), np.float32)
            cnt = 0
            for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
                for wsl in (slice(0, -ws), slice(-ws, -shift),
                            slice(-shift, None)):
                    img[:, hs, wsl, :] = cnt
                    cnt += 1
            mw = img.reshape(1, h // ws, ws, w // ws, ws, 1).transpose(
                0, 1, 3, 2, 4, 5).reshape(-1, ws * ws)
            am = mw[:, None, :] - mw[:, :, None]
            self.mask = torch.tensor(
                np.where(am != 0, -100.0, 0.0).astype(np.float32))
        else:
            self.mask = None

    def forward(self, x):
        h, w = self.hw
        b, l, c = x.shape
        ws = self.ws
        shortcut = x
        x = self.norm1(x).view(b, h, w, c)
        if self.shift > 0:
            x = torch.roll(x, (-self.shift, -self.shift), dims=(1, 2))
        xw = x.view(b, h // ws, ws, w // ws, ws, c).permute(
            0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)
        aw = self.attn(xw, self.mask)
        x = aw.view(b, h // ws, w // ws, ws, ws, c).permute(
            0, 1, 3, 2, 4, 5).reshape(b, h, w, c)
        if self.shift > 0:
            x = torch.roll(x, (self.shift, self.shift), dims=(1, 2))
        x = shortcut + x.view(b, l, c)
        return x + self.mlp(self.norm2(x))


class TorchSwin(tnn.Module):
    def __init__(self, img=64, patch=4, dim=24, depths=(1, 2, 1),
                 heads=(2, 4, 8), ws=4, num_classes=10):
        super().__init__()
        self.patch_embed = tnn.Conv2d(3, dim, patch, patch)
        self.patch_norm = tnn.LayerNorm(dim)
        hw = (img // patch, img // patch)
        stages, mergers = [], []
        d = dim
        for si, (depth, h) in enumerate(zip(depths, heads)):
            stages.append(tnn.ModuleList(
                TorchSwinBlock(d, hw, h, ws, 0 if bi % 2 == 0 else ws // 2)
                for bi in range(depth)))
            if si < len(depths) - 1:
                merger = tnn.Module()
                merger.norm = tnn.LayerNorm(4 * d)
                merger.reduction = tnn.Linear(4 * d, 2 * d, bias=False)
                merger.hw = hw
                mergers.append(merger)
                hw = (hw[0] // 2, hw[1] // 2)
                d *= 2
        self.stages = tnn.ModuleList(stages)
        self.mergers = tnn.ModuleList(mergers)
        self.norm = tnn.LayerNorm(d)
        self.head = tnn.Linear(d, num_classes)

    def forward(self, x):
        x = self.patch_embed(x)
        b, c, h, w = x.shape
        x = self.patch_norm(x.flatten(2).transpose(1, 2))
        for si, blocks in enumerate(self.stages):
            for blk in blocks:
                x = blk(x)
            if si < len(self.mergers):
                m = self.mergers[si]
                h, w = m.hw
                bb, l, cc = x.shape
                x = x.view(bb, h // 2, 2, w // 2, 2, cc).permute(
                    0, 1, 3, 2, 4, 5).reshape(bb, (h // 2) * (w // 2), 4 * cc)
                x = m.reduction(m.norm(x))
        return self.head(self.norm(x).mean(dim=1))


def test_swin_parity(rng):
    from tlxcv_tpu.models.classification import SwinTransformer

    model = SwinTransformer(img_size=64, patch_size=4, embed_dim=24,
                            depths=(1, 2, 1), num_heads=(2, 4, 8),
                            window_size=4, num_classes=10,
                            drop_path_rate=0.0)
    roundtrip(TorchSwin(), model, _x(rng, 64), atol=5e-4)


# ----------------------------------------------------------------- levit
class TorchLinearBN(tnn.Module):
    def __init__(self, a, b):
        super().__init__()
        self.c = tnn.Linear(a, b, bias=False)
        self.bn = tnn.BatchNorm1d(b)

    def forward(self, x):
        y = self.c(x)
        return self.bn(y.flatten(0, 1)).reshape(y.shape)


class TorchConvBN(tnn.Module):
    def __init__(self, a, b, ks=1, s=1, p=0):
        super().__init__()
        self.c = tnn.Conv2d(a, b, ks, s, p, bias=False)
        self.bn = tnn.BatchNorm2d(b)

    def forward(self, x):
        return self.bn(self.c(x))


def _torch_offset_table(pq, pk, stride=1):
    offsets, idxs = {}, []
    for p1 in pq:
        for p2 in pk:
            off = (abs(p1[0] * stride - p2[0]), abs(p1[1] * stride - p2[1]))
            if off not in offsets:
                offsets[off] = len(offsets)
            idxs.append(offsets[off])
    return (torch.tensor(idxs).view(len(pq), len(pk)), len(offsets))


class TorchLeViTAttn(tnn.Module):
    def __init__(self, dim, key_dim, heads, ratio, res):
        super().__init__()
        self.heads, self.key_dim = heads, key_dim
        self.scale = key_dim ** -0.5
        self.d = ratio * key_dim
        self.dh = self.d * heads
        self.h = self.dh + 2 * key_dim * heads
        self.qkv = TorchLinearBN(dim, self.h)
        self.proj = tnn.Sequential(tnn.Hardswish(),
                                   TorchLinearBN(self.dh, dim))
        pts = list(itertools.product(range(res), range(res)))
        idxs, n_off = _torch_offset_table(pts, pts)
        self.attention_biases = tnn.Parameter(torch.randn(heads, n_off) * .02)
        self.register_buffer("bias_idxs", idxs)

    def forward(self, x):
        b, n, _ = x.shape
        qkv = self.qkv(x).view(b, n, self.heads, self.h // self.heads)
        q = qkv[..., :self.key_dim].permute(0, 2, 1, 3)
        k = qkv[..., self.key_dim:2 * self.key_dim].permute(0, 2, 1, 3)
        v = qkv[..., 2 * self.key_dim:].permute(0, 2, 1, 3)
        bias = self.attention_biases[:, self.bias_idxs]
        attn = ((q @ k.transpose(-2, -1)) * self.scale + bias).softmax(-1)
        out = (attn @ v).transpose(1, 2).reshape(b, n, self.dh)
        return self.proj(out)


class TorchLeViTSub(tnn.Module):
    def __init__(self, cin, cout, key_dim, heads, ratio, stride, res, res_):
        super().__init__()
        self.heads, self.key_dim = heads, key_dim
        self.scale = key_dim ** -0.5
        self.d = ratio * key_dim
        self.dh = self.d * heads
        self.stride, self.res = stride, res
        self.kv = TorchLinearBN(cin, self.dh + key_dim * heads)
        self.q = TorchLinearBN(cin, key_dim * heads)
        self.proj = tnn.Sequential(tnn.Hardswish(),
                                   TorchLinearBN(self.dh, cout))
        pts = list(itertools.product(range(res), range(res)))
        pts_ = list(itertools.product(range(res_), range(res_)))
        idxs, n_off = _torch_offset_table(pts_, pts, stride)
        self.attention_biases = tnn.Parameter(torch.randn(heads, n_off) * .02)
        self.register_buffer("bias_idxs", idxs)

    def forward(self, x):
        b, n, c = x.shape
        r, s = self.res, self.stride
        kv = self.kv(x).view(b, n, self.heads, -1)
        k = kv[..., :self.key_dim].permute(0, 2, 1, 3)
        v = kv[..., self.key_dim:].permute(0, 2, 1, 3)
        xq = x.view(b, r, r, c)[:, ::s, ::s].reshape(b, -1, c)
        nq = xq.shape[1]
        q = self.q(xq).view(b, nq, self.heads, self.key_dim).permute(0, 2, 1, 3)
        bias = self.attention_biases[:, self.bias_idxs]
        attn = ((q @ k.transpose(-2, -1)) * self.scale + bias).softmax(-1)
        out = (attn @ v).transpose(1, 2).reshape(b, nq, self.dh)
        return self.proj(out)


class TorchLeViTMlp(tnn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.l1 = TorchLinearBN(dim, hidden)
        self.l2 = TorchLinearBN(hidden, dim)

    def forward(self, x):
        return self.l2(tnn.functional.hardswish(self.l1(x)))


class TorchLeViT(tnn.Module):
    def __init__(self, img=64, dims=(32, 64, 96), key_dim=8,
                 depths=(1, 1, 1), heads=(2, 2, 2), num_classes=10):
        super().__init__()
        n = dims[0]
        self.patch_embed = tnn.Sequential(
            TorchConvBN(3, n // 8, 3, 2, 1), tnn.Hardswish(),
            TorchConvBN(n // 8, n // 4, 3, 2, 1), tnn.Hardswish(),
            TorchConvBN(n // 4, n // 2, 3, 2, 1), tnn.Hardswish(),
            TorchConvBN(n // 2, n, 3, 2, 1))
        res = img // 16
        blocks = []
        down = [["Subsample", key_dim, dims[0] // key_dim, 4, 2, 2],
                ["Subsample", key_dim, dims[1] // key_dim, 4, 2, 2], [""]]
        for i, (ed, dpth, nh, do) in enumerate(zip(dims, depths, heads, down)):
            for _ in range(dpth):
                blocks.append(TorchLeViTAttn(ed, key_dim, nh, 2, res))
                blocks.append(TorchLeViTMlp(ed, ed * 2))
            if do[0] == "Subsample":
                res_ = (res - 1) // do[5] + 1
                blocks.append(TorchLeViTSub(
                    dims[i], dims[i + 1], do[1], do[2], do[3], do[5],
                    res, res_))
                res = res_
                blocks.append(TorchLeViTMlp(dims[i + 1], dims[i + 1] * 2))
        self.blocks = tnn.ModuleList(blocks)
        self.head_bn = tnn.BatchNorm1d(dims[-1])
        self.head_l = tnn.Linear(dims[-1], num_classes)

    def forward(self, x):
        x = self.patch_embed(x)
        x = x.flatten(2).transpose(1, 2)
        for blk in self.blocks:
            if isinstance(blk, TorchLeViTSub):
                x = blk(x)
            else:
                x = x + blk(x)
        x = x.mean(dim=1)
        return self.head_l(self.head_bn(x))


def test_levit_parity(rng):
    from tlxcv_tpu.models.classification import LeViT

    model = LeViT(img_size=64, embed_dim=(32, 64, 96), key_dim=(8, 8, 8),
                  depth=(1, 1, 1), num_heads=(2, 2, 2), num_classes=10)
    roundtrip(TorchLeViT(), model, _x(rng, 64), atol=5e-4)


# ------------------------------------------------------------ twins/gvt
class TorchGSA(tnn.Module):
    def __init__(self, dim, heads, sr):
        super().__init__()
        self.heads = heads
        self.hd = dim // heads
        self.scale = self.hd ** -0.5
        self.sr_ratio = sr
        self.q = tnn.Linear(dim, dim)
        self.kv = tnn.Linear(dim, dim * 2)
        self.proj = tnn.Linear(dim, dim)
        if sr > 1:
            self.sr = tnn.Conv2d(dim, dim, sr, sr)
            self.norm = tnn.LayerNorm(dim)

    def forward(self, x, hw):
        h, w = hw
        b, n, c = x.shape
        q = self.q(x).view(b, n, self.heads, self.hd).permute(0, 2, 1, 3)
        if self.sr_ratio > 1:
            x_ = x.transpose(1, 2).view(b, c, h, w)
            x_ = self.sr(x_).flatten(2).transpose(1, 2)
            x_ = self.norm(x_)
        else:
            x_ = x
        m = x_.shape[1]
        kv = self.kv(x_).view(b, m, 2, self.heads, self.hd).permute(
            2, 0, 3, 1, 4)
        k, v = kv[0], kv[1]
        attn = ((q @ k.transpose(-2, -1)) * self.scale).softmax(-1)
        out = (attn @ v).transpose(1, 2).reshape(b, n, c)
        return self.proj(out)


class TorchLSA(tnn.Module):
    def __init__(self, dim, heads, ws):
        super().__init__()
        self.heads = heads
        self.hd = dim // heads
        self.scale = self.hd ** -0.5
        self.ws = ws
        self.qkv = tnn.Linear(dim, dim * 3)
        self.proj = tnn.Linear(dim, dim)

    def forward(self, x, hw):
        h, w = hw
        b, n, c = x.shape
        ws = self.ws
        hg, wg = h // ws, w // ws
        x = x.view(b, hg, ws, wg, ws, c).permute(0, 1, 3, 2, 4, 5)
        qkv = self.qkv(x).reshape(b, hg * wg, ws * ws, 3, self.heads,
                                  self.hd).permute(3, 0, 1, 4, 2, 5)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = ((q @ k.transpose(-2, -1)) * self.scale).softmax(-1)
        out = (attn @ v).permute(0, 1, 3, 2, 4)
        out = out.reshape(b, hg, wg, ws, ws, c).permute(0, 1, 3, 2, 4, 5)
        return self.proj(out.reshape(b, n, c))


class TorchTwinsBlock(tnn.Module):
    def __init__(self, dim, heads, mlp_ratio, sr, ws):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim, eps=1e-6)
        self.attn = TorchGSA(dim, heads, sr) if ws == 1 else \
            TorchLSA(dim, heads, ws)
        self.norm2 = tnn.LayerNorm(dim, eps=1e-6)
        self.mlp = TorchMlp(dim, int(dim * mlp_ratio))

    def forward(self, x, hw):
        x = x + self.attn(self.norm1(x), hw)
        return x + self.mlp(self.norm2(x))


class TorchTwins(tnn.Module):
    def __init__(self, dims=(16, 32, 64, 128), heads=(1, 2, 4, 8),
                 mlps=(4, 4, 4, 4), depths=(1, 1, 2, 1), wss=(2, 2, 2, 2),
                 srs=(8, 4, 2, 1), num_classes=10):
        super().__init__()
        self.depths = depths
        pes = []
        cin = 3
        for i, d in enumerate(dims):
            ps = 4 if i == 0 else 2
            pe = tnn.Module()
            pe.proj = tnn.Conv2d(cin, d, ps, ps)
            pe.norm = tnn.LayerNorm(d)
            pes.append(pe)
            cin = d
        self.patch_embeds = tnn.ModuleList(pes)
        self.blocks = tnn.ModuleList(
            tnn.ModuleList(TorchTwinsBlock(
                dims[k], heads[k], mlps[k], srs[k],
                1 if i % 2 == 1 else wss[k]) for i in range(depths[k]))
            for k in range(len(depths)))
        self.pos_block = tnn.ModuleList(
            tnn.Conv2d(d, d, 3, 1, 1, groups=d) for d in dims)
        self.norm = tnn.LayerNorm(dims[-1], eps=1e-6)
        self.head = tnn.Linear(dims[-1], num_classes)

    def forward(self, x):
        b = x.shape[0]
        for i in range(len(self.depths)):
            pe = self.patch_embeds[i]
            x = pe.proj(x)
            _, c, h, w = x.shape
            x = pe.norm(x.flatten(2).transpose(1, 2))
            for j, blk in enumerate(self.blocks[i]):
                x = blk(x, (h, w))
                if j == 0:
                    feat = x.transpose(1, 2).view(b, c, h, w)
                    x = (self.pos_block[i](feat) + feat).flatten(2).transpose(
                        1, 2)
            if i < len(self.depths) - 1:
                x = x.transpose(1, 2).view(b, c, h, w).permute(
                    0, 2, 3, 1).permute(0, 3, 1, 2)
        return self.head(self.norm(x).mean(dim=1))


def test_twins_parity(rng):
    from tlxcv_tpu.models.classification import ALTGVT

    model = ALTGVT(embed_dims=(16, 32, 64, 128), num_heads=(1, 2, 4, 8),
                   mlp_ratios=(4, 4, 4, 4), depths=(1, 1, 2, 1),
                   wss=(2, 2, 2, 2), sr_ratios=(8, 4, 2, 1), num_classes=10)
    roundtrip(TorchTwins(), model, _x(rng, 64), atol=5e-4)
