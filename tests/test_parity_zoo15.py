"""Zoo parity wave 15: PFLD (landmarks), ArcFace (margin head), and
Inception-I3D (Conv3d / NDHWC video path) torch oracles — after this
every task domain has at least one oracle-verified model (reference
tlxcv/models/{facial_landmark_detection/pfld.py,
face_recognition/arcface.py, video_classification/i3d.py}).
"""
import math

import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

from tests.test_parity_zoo import _randomize_bn, _x
from tlxcv_tpu.core import pure, split
from tlxcv_tpu.utils.convert import convert_by_order

torch.manual_seed(14)


def _convert(tmodel, model):
    tmodel = tmodel.eval()
    _randomize_bn(tmodel)
    unmatched = convert_by_order(
        {k: v.detach().numpy() for k, v in tmodel.state_dict().items()},
        model, source="torch")
    assert not unmatched, unmatched
    return tmodel


# -------------------------------------------------------------------- pfld
class TPConvBN(tnn.Module):
    def __init__(self, cin, cout, k, stride, padding="same"):
        super().__init__()
        pad = (k - 1) // 2 if padding == "same" else 0
        self.conv = tnn.Conv2d(cin, cout, k, stride, pad, bias=False)
        self.bn = tnn.BatchNorm2d(cout)

    def forward(self, x):
        return torch.relu(self.bn(self.conv(x)))


class TPInvRes(tnn.Module):
    def __init__(self, inp, oup, stride, use_res, expand=6):
        super().__init__()
        mid = inp * expand
        self.use_res = use_res
        self.conv = tnn.Sequential(
            tnn.Conv2d(inp, mid, 1, bias=False), tnn.BatchNorm2d(mid),
            tnn.ReLU(),
            tnn.Conv2d(mid, mid, 3, stride, 1, groups=mid, bias=False),
            tnn.BatchNorm2d(mid), tnn.ReLU(),
            tnn.Conv2d(mid, oup, 1, bias=False), tnn.BatchNorm2d(oup))

    def forward(self, x):
        out = self.conv(x)
        return x + out if self.use_res else out


def _hwc_flat(x):
    return x.permute(0, 2, 3, 1).reshape(x.shape[0], -1)


class TPFLDBackbone(tnn.Module):
    def __init__(self, num_landmarks=68):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 3, 2, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.conv2 = tnn.Conv2d(64, 64, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(64)
        self.conv3_1 = TPInvRes(64, 64, 2, False, 2)
        self.blocks3 = tnn.ModuleList(
            TPInvRes(64, 64, 1, True, 2) for _ in range(4))
        self.conv4_1 = TPInvRes(64, 128, 2, False, 2)
        self.conv5_1 = TPInvRes(128, 128, 1, False, 4)
        self.blocks5 = tnn.ModuleList(
            TPInvRes(128, 128, 1, True, 4) for _ in range(5))
        self.conv6_1 = TPInvRes(128, 16, 1, False, 2)
        self.conv7 = TPConvBN(16, 32, 3, 2)
        self.conv8 = tnn.Conv2d(32, 128, 7)
        self.bn8 = tnn.BatchNorm2d(128)  # dead in forward — the
        # reference declares-but-skips it too (pfld.py:169 vs :209)
        self.fc = tnn.Linear(14 * 14 * 16 + 7 * 7 * 32 + 128,
                             num_landmarks * 2)

    def forward(self, x):
        x = torch.relu(self.bn1(self.conv1(x)))
        x = torch.relu(self.bn2(self.conv2(x)))
        x = self.conv3_1(x)
        for blk in self.blocks3:
            x = blk(x)
        features = x
        x = self.conv4_1(features)
        x = self.conv5_1(x)
        for blk in self.blocks5:
            x = blk(x)
        x = self.conv6_1(x)
        x1 = _hwc_flat(x)
        x = self.conv7(x)
        x2 = _hwc_flat(x)
        x = torch.relu(self.conv8(x))
        x3 = _hwc_flat(x)
        return self.fc(torch.cat([x1, x2, x3], 1)), features


class TAuxNet(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = TPConvBN(64, 128, 3, 2)
        self.conv2 = TPConvBN(128, 128, 3, 1)
        self.conv3 = TPConvBN(128, 32, 3, 2)
        self.conv4 = TPConvBN(32, 128, 7, 1, padding="valid")
        self.fc1 = tnn.Linear(128, 32)
        self.fc2 = tnn.Linear(32, 3)

    def forward(self, x):
        x = self.conv4(self.conv3(self.conv2(self.conv1(x))))
        return self.fc2(self.fc1(_hwc_flat(x)))


class TPFLD(tnn.Module):
    def __init__(self, num_landmarks=68):
        super().__init__()
        self.backbone = TPFLDBackbone(num_landmarks)
        self.auxiliarynet = TAuxNet()

    def forward(self, x):
        lm, feats = self.backbone(x)
        return lm, self.auxiliarynet(feats)


def test_pfld_parity(rng):
    from tlxcv_tpu.models.facial_landmark_detection import PFLD

    tm = TPFLD()
    model = PFLD(num_landmarks=68)
    _convert(tm, model)
    x = _x(rng, 112, batch=1)
    with torch.no_grad():
        ref_lm, ref_angle = tm(torch.tensor(x))
    import jax.numpy as jnp

    params, state = split(model)
    xj = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    (lm, feats), _ = pure(model)(params, state, xj)
    np.testing.assert_allclose(np.asarray(lm), ref_lm.numpy(), atol=5e-4,
                               rtol=5e-4)
    angle = model.auxiliarynet(jnp.asarray(np.asarray(feats)))
    np.testing.assert_allclose(np.asarray(angle), ref_angle.numpy(),
                               atol=5e-4, rtol=5e-4)


# ------------------------------------------------------------------ arcface
class TArcHead(tnn.Module):
    def __init__(self, num_classes, embed_size, margin=0.5, scale=64.0):
        super().__init__()
        self.weight = tnn.Parameter(torch.randn(embed_size, num_classes))
        self.cos_m, self.sin_m = math.cos(margin), math.sin(margin)
        self.th = math.cos(math.pi - margin)
        self.mm = self.sin_m * margin
        self.scale = scale
        self.num_classes = num_classes

    def forward(self, e, labels):
        e = e / (e.norm(dim=1, keepdim=True) + 1e-9)
        w = self.weight / (self.weight.norm(dim=0, keepdim=True) + 1e-9)
        cos_t = e @ w
        sin_t = torch.sqrt((1 - cos_t ** 2).clamp(0, 1))
        cos_mt = cos_t * self.cos_m - sin_t * self.sin_m
        cos_mt = torch.where(cos_t > self.th, cos_mt, cos_t - self.mm)
        mask = F.one_hot(labels, self.num_classes).to(cos_t.dtype)
        return torch.where(mask == 1.0, cos_mt, cos_t) * self.scale


class TArcFace(tnn.Module):
    def __init__(self, num_classes=10, embed_size=64, input_size=64):
        super().__init__()
        from tests.test_parity_zoo10 import TResNet18Trunk

        self.backbone = TResNet18Trunk()
        feat_ch, fh = 512, input_size // 32
        self.bn = tnn.BatchNorm2d(feat_ch, eps=1.001e-5)
        self.dense = tnn.Linear(feat_ch * fh * fh, embed_size)
        self.bn2 = tnn.BatchNorm1d(embed_size, eps=1.001e-5)
        self.head = TArcHead(num_classes, embed_size)

    def forward(self, x, labels):
        x = self.backbone(x)[-1]
        x = self.bn(x)
        x = _hwc_flat(x)
        e = self.bn2(self.dense(x))
        e = e / (e.norm(dim=1, keepdim=True) + 1e-9)
        return self.head(e, labels)


def test_arcface_parity(rng):
    from tlxcv_tpu.models.classification.resnet import ResNet
    from tlxcv_tpu.models.face_recognition import ArcFace

    tm = TArcFace()
    model = ArcFace(input_size=64, embed_size=64, num_classes=10,
                    backbone=ResNet(depth=18, num_classes=0,
                                    with_pool=False))
    _convert(tm, model)
    x = _x(rng, 64)
    labels = np.asarray([1, 7])
    with torch.no_grad():
        ref = tm(torch.tensor(x), torch.tensor(labels)).numpy()
    import jax.numpy as jnp

    params, state = split(model)
    out, _ = pure(model)(params, state,
                         jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                         jnp.asarray(labels))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-3, rtol=2e-3)


# --------------------------------------------------------------------- i3d
def _pad_same(x, k, s):
    """Explicit SAME padding per spatial dim (NCDHW)."""
    pads = []
    for dim, (kk, ss) in enumerate(zip(k, s)):
        size = x.shape[2 + dim]
        out = -(-size // ss)
        total = max((out - 1) * ss + kk - size, 0)
        pads.append((total // 2, total - total // 2))
    # F.pad takes reversed dim order (W, H, D)
    flat = [v for p in reversed(pads) for v in p]
    return F.pad(x, flat)


class TUnit3D(tnn.Module):
    def __init__(self, cin, cout, k=(1, 1, 1), stride=(1, 1, 1),
                 activation="relu", use_bn=True, use_bias=False):
        super().__init__()
        self.k, self.stride = k, stride
        self.conv = tnn.Conv3d(cin, cout, k, stride, 0, bias=use_bias)
        self.bn = tnn.BatchNorm3d(cout, eps=1e-3) if use_bn else None
        self.act = activation

    def forward(self, x):
        x = self.conv(_pad_same(x, self.k, self.stride))
        if self.bn is not None:
            x = self.bn(x)
        return torch.relu(x) if self.act else x


class TInception3D(tnn.Module):
    def __init__(self, cin, oc):
        super().__init__()
        b0, b1a, b1b, b2a, b2b, b3b = oc
        self.b0 = TUnit3D(cin, b0)
        self.b1a = TUnit3D(cin, b1a)
        self.b1b = TUnit3D(b1a, b1b, (3, 3, 3))
        self.b2a = TUnit3D(cin, b2a)
        self.b2b = TUnit3D(b2a, b2b, (3, 3, 3))
        self.b3b = TUnit3D(cin, b3b)

    def forward(self, x):
        p = F.max_pool3d(x, 3, 1, 1)
        return torch.cat([self.b0(x), self.b1b(self.b1a(x)),
                          self.b2b(self.b2a(x)), self.b3b(p)], 1)


class TI3D(tnn.Module):
    def __init__(self, num_classes=5):
        super().__init__()
        self.conv1 = TUnit3D(3, 64, (7, 7, 7), (2, 2, 2))
        self.conv2b = TUnit3D(64, 64)
        self.conv2c = TUnit3D(64, 192, (3, 3, 3))
        self.mixed_3b = TInception3D(192, (64, 96, 128, 16, 32, 32))
        self.mixed_3c = TInception3D(256, (128, 128, 192, 32, 96, 64))
        self.mixed_4b = TInception3D(480, (192, 96, 208, 16, 48, 64))
        self.mixed_4c = TInception3D(512, (160, 112, 224, 24, 64, 64))
        self.mixed_4d = TInception3D(512, (128, 128, 256, 24, 64, 64))
        self.mixed_4e = TInception3D(512, (112, 144, 288, 32, 64, 64))
        self.mixed_4f = TInception3D(528, (256, 160, 320, 32, 128, 128))
        self.mixed_5b = TInception3D(832, (256, 160, 320, 32, 128, 128))
        self.mixed_5c = TInception3D(832, (384, 192, 384, 48, 128, 128))
        self.logits = TUnit3D(1024, num_classes, use_bn=False,
                              use_bias=True, activation=None)

    def forward(self, x):
        x = self.conv1(x)
        x = F.max_pool3d(x, (1, 3, 3), (1, 2, 2), (0, 1, 1))
        x = self.conv2c(self.conv2b(x))
        x = F.max_pool3d(x, (1, 3, 3), (1, 2, 2), (0, 1, 1))
        x = self.mixed_3c(self.mixed_3b(x))
        x = F.max_pool3d(x, 3, 2, 1)
        x = self.mixed_4f(self.mixed_4e(self.mixed_4d(
            self.mixed_4c(self.mixed_4b(x)))))
        x = F.max_pool3d(x, (2, 2, 2), (2, 2, 2))
        x = self.mixed_5c(self.mixed_5b(x))
        x = x.mean(dim=(3, 4), keepdim=True)
        logits = self.logits(x)
        return logits[:, :, :, 0, 0].transpose(1, 2)  # [B, T', classes]


def test_i3d_parity(rng):
    from tlxcv_tpu.models.video_classification import InceptionI3d

    tm = TI3D()
    model = InceptionI3d(num_classes=5)
    _convert(tm, model)
    x = rng.normal(size=(1, 3, 8, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(x)).numpy()
    import jax.numpy as jnp

    params, state = split(model)
    xj = jnp.asarray(np.transpose(x, (0, 2, 3, 4, 1)))  # NDHWC
    out, _ = pure(model)(params, state, xj)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-3, rtol=1e-3)
