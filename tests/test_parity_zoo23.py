"""Zoo parity wave 23: UNet (valid-padding crop-concat), DeepLabV3
(plain dilated ASPP over C5), HRNetW48Contrast (seg + normalized
projection heads) torch oracles — the last seg-family models without
full-model oracles (reference tlxcv/models/segmentation/{unet.py,
deeplabv3.py, hrnet_contrast.py}).
"""
import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

from tests.test_parity_zoo import _randomize_bn
from tests.test_parity_zoo2 import TResNet18VD
from tests.test_parity_zoo12 import TConvBNReLU, seg_roundtrip
from tests.test_parity_zoo13 import THRNetFCN  # reuse trunk pieces
from tlxcv_tpu.core import pure, split
from tlxcv_tpu.utils.convert import convert_by_order

torch.manual_seed(22)


# -------------------------------------------------------------------- unet
class TUConvBlock(tnn.Module):
    def __init__(self, cin, f):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, f, 3)  # VALID padding
        self.conv2 = tnn.Conv2d(f, f, 3)

    def forward(self, x):
        x = torch.relu(self.conv1(x))
        return torch.relu(self.conv2(x))


class TUNet(tnn.Module):
    def __init__(self, channels=1, num_classes=2, depth=3, froot=8):
        super().__init__()
        f = lambda i: 2 ** i * froot
        self.down_blocks = tnn.ModuleList(
            [TUConvBlock(channels, f(0)), TUConvBlock(f(0), f(1))])
        self.bottleneck = TUConvBlock(f(1), f(2))
        self.up_blocks = tnn.ModuleList(
            [tnn.ConvTranspose2d(f(2), f(2) // 2, 2, 2),
             tnn.ConvTranspose2d(f(1), f(1) // 2, 2, 2)])
        self.dec_blocks = tnn.ModuleList(
            [TUConvBlock(f(2) // 2 + f(1), f(1)),
             TUConvBlock(f(1) // 2 + f(0), f(0))])
        self.head = tnn.Conv2d(f(0), num_classes, 1)

    def forward(self, x):
        skips = []
        for blk in self.down_blocks:
            x = blk(x)
            skips.append(x)
            x = F.max_pool2d(x, 2, 2)
        x = self.bottleneck(x)
        for i, (up, dec) in enumerate(zip(self.up_blocks, self.dec_blocks)):
            x = torch.relu(up(x))
            skip = skips[1 - i]
            hd = (skip.shape[2] - x.shape[2]) // 2
            wd = (skip.shape[3] - x.shape[3]) // 2
            crop = skip[:, :, hd:hd + x.shape[2], wd:wd + x.shape[3]]
            x = dec(torch.cat([crop, x], 1))
        return torch.relu(self.head(x))


def test_unet_parity(rng):
    from tlxcv_tpu.models.segmentation import Unet

    tm = TUNet().eval()
    model = Unet(nx=76, ny=76, channels=1, num_classes=2, layer_depth=3,
                 filters_root=8)
    unmatched = convert_by_order(
        {k: v.detach().numpy() for k, v in tm.state_dict().items()},
        model, source="torch")
    assert not unmatched, unmatched
    x = rng.normal(size=(1, 1, 76, 76)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(x)).numpy()
    import jax.numpy as jnp

    params, state = split(model)
    out, _ = pure(model)(params, state,
                         jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out),
                               ref.transpose(0, 2, 3, 1), atol=1e-4,
                               rtol=1e-4)


# --------------------------------------------------------------- deeplabv3
class TASPPPlain(tnn.Module):
    """ASPP with plain dilated 3x3 convs (use_sep_conv=False path)."""

    def __init__(self, ratios, cin, cout):
        super().__init__()
        self.blocks = tnn.ModuleList(
            TConvBNReLU(cin, cout, 1 if r == 1 else 3, dilation=r)
            for r in ratios)
        self.global_conv = TConvBNReLU(cin, cout, 1, padding=0)
        self.project = TConvBNReLU(cout * (len(ratios) + 1), cout, 1,
                                   padding=0)

    def forward(self, x):
        outs = [b(x) for b in self.blocks]
        gp = self.global_conv(x.mean(dim=(2, 3), keepdim=True))
        outs.append(gp.expand(-1, -1, x.shape[2], x.shape[3]))
        return self.project(torch.cat(outs, 1))


class TDeepLabV3(tnn.Module):
    def __init__(self, num_classes=4):
        super().__init__()
        self.backbone = TResNet18VD(output_stride=8)
        self.aspp = TASPPPlain((1, 12, 24, 36), 512, 256)
        self.classifier = tnn.Conv2d(256, num_classes, 1)

    def forward(self, x):
        feats = self.backbone(x)
        y = self.classifier(self.aspp(feats[3]))
        return F.interpolate(y, size=x.shape[2:], mode="bilinear",
                             align_corners=False)


def test_deeplabv3_parity(rng):
    from tlxcv_tpu.models.backbones import resnet18_vd
    from tlxcv_tpu.models.segmentation import DeepLabV3

    model = DeepLabV3(num_classes=4, backbone=resnet18_vd())
    seg_roundtrip(TDeepLabV3(), model,
                  np.random.default_rng(3).normal(
                      size=(1, 3, 64, 64)).astype(np.float32), atol=1e-3)


# ------------------------------------------------------- hrnet w48 contrast
def test_hrnet_contrast_parity(rng):
    from tests.test_parity_zoo2 import TCBR
    from tlxcv_tpu.models.backbones.hrnet import HRNet
    from tlxcv_tpu.models.segmentation import HRNetW48Contrast

    class TContrast(tnn.Module):
        def __init__(self, num_classes=4, proj_dim=16, cin=120):
            super().__init__()
            self.backbone = THRNetFCN().backbone  # micro HRNet trunk
            self.seg_head = tnn.Sequential(
                TCBR(cin, cin, 3), tnn.Conv2d(cin, num_classes, 1))
            self.proj_head = tnn.Sequential(
                tnn.Conv2d(cin, cin, 1), tnn.ReLU(),
                tnn.Conv2d(cin, proj_dim, 1))

        def forward(self, x):
            xs = self.backbone(x)
            size = xs[0].shape[2:]
            ups = [xs[0]] + [F.interpolate(b, size=size, mode="bilinear",
                                           align_corners=False)
                             for b in xs[1:]]
            feat = torch.cat(ups, 1)
            logits = F.interpolate(self.seg_head(feat), size=x.shape[2:],
                                   mode="bilinear", align_corners=False)
            proj = self.proj_head(feat)
            proj = proj / (proj.norm(dim=1, keepdim=True) + 1e-9)
            return logits, proj

    tm = TContrast().eval()
    _randomize_bn(tm)
    bb = HRNet(stage1_num_modules=1, stage1_num_blocks=(1,),
               stage1_num_channels=(8,),
               stage2_num_modules=1, stage2_num_blocks=(1, 1),
               stage2_num_channels=(8, 16),
               stage3_num_modules=1, stage3_num_blocks=(1, 1, 1),
               stage3_num_channels=(8, 16, 32),
               stage4_num_modules=1, stage4_num_blocks=(1, 1, 1, 1),
               stage4_num_channels=(8, 16, 32, 64))
    model = HRNetW48Contrast(num_classes=4, proj_dim=16, backbone=bb)
    unmatched = convert_by_order(
        {k: v.detach().numpy() for k, v in tm.state_dict().items()},
        model, source="torch")
    assert not unmatched, unmatched
    x = rng.normal(size=(1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref_logits, ref_proj = tm(torch.tensor(x))
    import jax
    import jax.numpy as jnp

    params, state = split(model)
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    logits, _ = pure(model)(params, state, xj)
    np.testing.assert_allclose(np.asarray(logits),
                               ref_logits.numpy().transpose(0, 2, 3, 1),
                               atol=5e-4, rtol=5e-4)
    # projection head (training-only output) — eval-mode eager call so
    # BN uses running stats like the torch twin
    feat = model.backbone.concat_features(xj)
    proj = model.proj_head(feat)
    proj = proj / (jnp.linalg.norm(proj, axis=-1, keepdims=True) + 1e-9)
    np.testing.assert_allclose(np.asarray(proj),
                               ref_proj.numpy().transpose(0, 2, 3, 1),
                               atol=5e-4, rtol=5e-4)
