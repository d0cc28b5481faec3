"""Zoo parity wave 9: alexnet, mobilenet_v1, cspdarknet53 (mish CSP),
xception_deeplab, pp_hgnet, pp_lcnet_v2, plain ViT torch oracles
(golden battery -> 46 archs; classification zoo fully oracle-verified).

Reference architectures: tlxcv/models/classification/{alexnet.py,
mobilenetv1.py, cspdarknet.py, xception_deeplab.py, pp_hgnet.py,
pp_lcnet_v2.py, vision_transformer.py}.
"""
import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

from tests.test_parity_zoo import _x, roundtrip
from tests.test_parity_zoo6 import TMHA, TMlp
from tests.test_parity_zoo8 import TConvBNAct, THSE

torch.manual_seed(8)


# ----------------------------------------------------------------- alexnet
class TAlexNet(tnn.Module):
    def __init__(self, num_classes=10):
        super().__init__()
        self.features = tnn.Sequential(
            tnn.Conv2d(3, 64, 11, 4, 2), tnn.ReLU(), tnn.MaxPool2d(3, 2),
            tnn.Conv2d(64, 192, 5, 1, 2), tnn.ReLU(), tnn.MaxPool2d(3, 2),
            tnn.Conv2d(192, 384, 3, 1, 1), tnn.ReLU(),
            tnn.Conv2d(384, 256, 3, 1, 1), tnn.ReLU(),
            tnn.Conv2d(256, 256, 3, 1, 1), tnn.ReLU(), tnn.MaxPool2d(3, 2))
        self.classifier = tnn.Sequential(
            tnn.Linear(256 * 6 * 6, 4096), tnn.ReLU(),
            tnn.Linear(4096, 4096), tnn.ReLU(),
            tnn.Linear(4096, num_classes))

    def forward(self, x):
        x = F.adaptive_avg_pool2d(self.features(x), (6, 6))
        # flatten in NHWC order — matches the framework's reshape
        x = x.permute(0, 2, 3, 1)
        return self.classifier(torch.flatten(x, 1))


def test_alexnet_parity(rng):
    from tlxcv_tpu.models.classification import alexnet

    roundtrip(TAlexNet(), alexnet(num_classes=10), _x(rng, 224, batch=1),
              atol=5e-4)


# ------------------------------------------------------------ mobilenet_v1
class TMBConvBNReLU(tnn.Module):
    def __init__(self, cin, cout, k, stride=1, padding=0, groups=1):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, k, stride, padding, groups=groups,
                               bias=False)
        self.bn = tnn.BatchNorm2d(cout)

    def forward(self, x):
        return torch.relu(self.bn(self.conv(x)))


class TDepthwiseSeparable(tnn.Module):
    def __init__(self, cin, cout, stride):
        super().__init__()
        self.dw = TMBConvBNReLU(cin, cin, 3, stride, 1, groups=cin)
        self.pw = TMBConvBNReLU(cin, cout, 1)

    def forward(self, x):
        return self.pw(self.dw(x))


class TMobileNetV1(tnn.Module):
    def __init__(self, num_classes=10):
        super().__init__()
        from tlxcv_tpu.models.classification.mobilenetv1 import _CFG

        self.stem = TMBConvBNReLU(3, 32, 3, 2, 1)
        blocks, cin = [], 32
        for out, stride in _CFG:
            blocks.append(TDepthwiseSeparable(cin, out, stride))
            cin = out
        self.blocks = tnn.ModuleList(blocks)
        self.fc = tnn.Linear(cin, num_classes)

    def forward(self, x):
        x = self.stem(x)
        for b in self.blocks:
            x = b(x)
        return self.fc(x.mean(dim=(2, 3)))


def test_mobilenet_v1_parity(rng):
    from tlxcv_tpu.models.classification import mobilenet_v1

    roundtrip(TMobileNetV1(), mobilenet_v1(num_classes=10), _x(rng, 64),
              atol=5e-4)


# ------------------------------------------------------------- cspdarknet
class TConvBNMish(tnn.Module):
    def __init__(self, cin, cout, k, stride=1):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, k, stride, k // 2, bias=False)
        self.bn = tnn.BatchNorm2d(cout)

    def forward(self, x):
        return F.mish(self.bn(self.conv(x)))


class TCSPResBlock(tnn.Module):
    def __init__(self, ch, hidden=None):
        super().__init__()
        hidden = hidden or ch
        self.conv1 = TConvBNMish(ch, hidden, 1)
        self.conv2 = TConvBNMish(hidden, ch, 3)

    def forward(self, x):
        return x + self.conv2(self.conv1(x))


class TCSPStage(tnn.Module):
    def __init__(self, cin, cout, n, first=False):
        super().__init__()
        self.down = TConvBNMish(cin, cout, 3, 2)
        split = cout if first else cout // 2
        self.split1 = TConvBNMish(cout, split, 1)
        self.split2 = TConvBNMish(cout, split, 1)
        self.blocks = tnn.ModuleList(
            TCSPResBlock(split, cout // 2 if first else None)
            for _ in range(n))
        self.post = TConvBNMish(split, split, 1)
        self.fuse = TConvBNMish(split * 2, cout, 1)

    def forward(self, x):
        x = self.down(x)
        y1, y2 = self.split1(x), self.split2(x)
        for b in self.blocks:
            y2 = b(y2)
        return self.fuse(torch.cat([y1, self.post(y2)], 1))


class TCSPDarkNet53(tnn.Module):
    def __init__(self, num_classes=10):
        super().__init__()
        self.stem = TConvBNMish(3, 32, 3)
        stages, cin = [], 32
        for i, (n, c) in enumerate(zip((1, 2, 8, 8, 4),
                                       (64, 128, 256, 512, 1024))):
            stages.append(TCSPStage(cin, c, n, first=(i == 0)))
            cin = c
        self.stages = tnn.ModuleList(stages)
        self.fc = tnn.Linear(1024, num_classes)

    def forward(self, x):
        x = self.stem(x)
        for s in self.stages:
            x = s(x)
        return self.fc(x.mean(dim=(2, 3)))


def test_cspdarknet53_parity(rng):
    from tlxcv_tpu.models.classification import cspdarknet53

    roundtrip(TCSPDarkNet53(), cspdarknet53(num_classes=10), _x(rng, 64),
              atol=5e-4)


# --------------------------------------------------------- xception_deeplab
def test_xception_deeplab_parity(rng):
    from tests.test_parity_zoo5 import TSepConv, TXceptionBlock
    from tlxcv_tpu.models.classification import xception_deeplab

    class TXceptionDeeplab(tnn.Module):
        def __init__(self, num_classes=10):
            super().__init__()
            self.stem = tnn.Sequential(
                tnn.Conv2d(3, 32, 3, 2, 1, bias=False), tnn.BatchNorm2d(32),
                tnn.ReLU(), tnn.Conv2d(32, 64, 3, 1, 1, bias=False),
                tnn.BatchNorm2d(64), tnn.ReLU())
            self.entry = tnn.Sequential(
                TXceptionBlock(64, 128, 2, 2, start_with_relu=False),
                TXceptionBlock(128, 256, 2, 2),
                TXceptionBlock(256, 728, 2, 2))
            self.middle = tnn.ModuleList(
                TXceptionBlock(728, 728, 3) for _ in range(16))
            self.exit1 = TXceptionBlock(728, 1024, 2, 2, grow_first=False)
            self.exit2 = tnn.Sequential(
                TSepConv(1024, 1536), tnn.ReLU(), TSepConv(1536, 1536),
                tnn.ReLU(), TSepConv(1536, 2048), tnn.ReLU())
            self.fc = tnn.Linear(2048, num_classes)

        def forward(self, x):
            x = self.entry(self.stem(x))
            for blk in self.middle:
                x = blk(x)
            x = self.exit2(self.exit1(x))
            return self.fc(x.mean(dim=(2, 3)))

    roundtrip(TXceptionDeeplab(), xception_deeplab(num_classes=10),
              _x(rng, 64), atol=5e-4)


# ---------------------------------------------------------------- pp_hgnet
class THGBlock(tnn.Module):
    def __init__(self, cin, mid, cout, layers=6, identity=False):
        super().__init__()
        convs, c = [], cin
        for _ in range(layers):
            convs.append(tnn.Sequential(
                tnn.Conv2d(c, mid, 3, 1, 1, bias=False), tnn.BatchNorm2d(mid),
                tnn.ReLU()))
            c = mid
        self.convs = tnn.ModuleList(convs)
        total = cin + layers * mid
        self.squeeze = tnn.Sequential(
            tnn.Conv2d(total, cout, 1, bias=False), tnn.BatchNorm2d(cout),
            tnn.ReLU())
        self.identity = identity

    def forward(self, x):
        feats, y = [x], x
        for conv in self.convs:
            y = conv(y)
            feats.append(y)
        out = self.squeeze(torch.cat(feats, 1))
        return out + x if self.identity else out


class TPPHGNet(tnn.Module):
    def __init__(self, num_classes=10):
        super().__init__()
        stem, cin = [], 3
        for i, c in enumerate((48, 48, 96)):
            stem.append(tnn.Sequential(
                tnn.Conv2d(cin, c, 3, 2 if i == 0 else 1, 1, bias=False),
                tnn.BatchNorm2d(c), tnn.ReLU()))
            cin = c
        self.stem = tnn.Sequential(*stem)
        blocks = []
        for ci, (bin_, mid, bout, n, down) in enumerate((
                (96, 96, 224, 1, False), (224, 128, 448, 1, True),
                (448, 160, 512, 2, True), (512, 192, 768, 1, True))):
            if down:
                blocks.append(tnn.Sequential(
                    tnn.Conv2d(cin, cin, 3, 2, 1, groups=cin, bias=False),
                    tnn.BatchNorm2d(cin)))
            for bi in range(n):
                blocks.append(THGBlock(cin if bi == 0 else bout, mid, bout,
                                       identity=bi > 0))
                cin = bout
        self.blocks = tnn.ModuleList(blocks)
        self.last = tnn.Conv2d(cin, 2048, 1)
        self.fc = tnn.Linear(2048, num_classes)

    def forward(self, x):
        x = F.max_pool2d(self.stem(x), 3, 2, 1)
        for b in self.blocks:
            x = b(x)
        x = x.mean(dim=(2, 3), keepdim=True)
        x = torch.relu(self.last(x))
        return self.fc(x[:, :, 0, 0])


def test_pp_hgnet_parity(rng):
    from tlxcv_tpu.models.classification import pp_hgnet_small

    roundtrip(TPPHGNet(), pp_hgnet_small(num_classes=10), _x(rng, 64),
              atol=5e-4)


# ------------------------------------------------------------- pp_lcnet_v2
class TLCV2Block(tnn.Module):
    def __init__(self, cin, cout, stride, dw_size=3, use_se=False):
        super().__init__()
        self.dw1 = TConvBNAct(cin, cin, dw_size, stride=stride, groups=cin,
                              act=None)
        self.se = THSE(cin) if use_se else None
        self.pw1 = TConvBNAct(cin, cout, 1)
        self.shortcut = stride == 1 and cin == cout

    def forward(self, x):
        y = self.dw1(x)
        if self.se is not None:
            y = self.se(y)
        y = self.pw1(y)
        return x + y if self.shortcut else y


class TPPLCNetV2(tnn.Module):
    def __init__(self, num_classes=10):
        super().__init__()
        self.stem = tnn.Sequential(TConvBNAct(3, 32, 3, 2),
                                   TLCV2Block(32, 64, 1))
        blocks, cin = [], 64
        for ci, (cout, n) in enumerate(((128, 2), (256, 2), (512, 4),
                                        (1024, 2))):
            for bi in range(n):
                blocks.append(TLCV2Block(cin, cout, 2 if bi == 0 else 1,
                                         dw_size=5 if ci >= 2 else 3,
                                         use_se=(ci == 3 and bi > 0)))
                cin = cout
        self.blocks = tnn.ModuleList(blocks)
        self.last = tnn.Conv2d(cin, 1280, 1)
        self.fc = tnn.Linear(1280, num_classes)

    def forward(self, x):
        x = self.stem(x)
        for b in self.blocks:
            x = b(x)
        x = x.mean(dim=(2, 3), keepdim=True)
        x = F.hardswish(self.last(x))
        return self.fc(x[:, :, 0, 0])


def test_pp_lcnet_v2_parity(rng):
    from tlxcv_tpu.models.classification import pp_lcnet_v2

    roundtrip(TPPLCNetV2(), pp_lcnet_v2(num_classes=10), _x(rng, 64),
              atol=5e-4)


# --------------------------------------------------------------------- vit
class TViT(tnn.Module):
    """Plain ViT twin (cls token only; eps=1e-6 blocks)."""

    def __init__(self, num_classes=10, dim=64, depth=2, heads=2,
                 n_patches=16):
        super().__init__()
        from tests.test_parity_zoo6 import TPatchEmbed, TViTBlock

        self.patch_embed = TPatchEmbed(dim)
        self.pos_embed = tnn.Parameter(torch.randn(1, n_patches + 1, dim)
                                       * 0.02)
        self.cls_token = tnn.Parameter(torch.randn(1, 1, dim) * 0.02)
        self.blocks = tnn.ModuleList(TViTBlock(dim, heads)
                                     for _ in range(depth))
        self.norm = tnn.LayerNorm(dim, eps=1e-6)
        self.head = tnn.Linear(dim, num_classes)

    def forward(self, x):
        b = x.shape[0]
        x = self.patch_embed(x)
        x = torch.cat([self.cls_token.expand(b, -1, -1), x], 1)
        x = x + self.pos_embed
        for blk in self.blocks:
            x = blk(x)
        return self.head(self.norm(x)[:, 0])


def test_vit_parity(rng):
    from tlxcv_tpu.models.classification.vision_transformer import \
        VisionTransformer

    model = VisionTransformer(img_size=64, patch_size=16, num_classes=10,
                              embed_dim=64, depth=2, num_heads=2,
                              qkv_bias=True)
    roundtrip(TViT(), model, _x(rng, 64), atol=5e-4)


def test_alexnet_real_torch_layout(rng):
    """A REAL torch AlexNet state_dict flattens CHW before its
    classifier; utils.convert.chw_flatten_to_hwc reorders that one
    weight so the checkpoint loads onto our NHWC-flatten model with
    exact parity (the workflow for real torchvision checkpoints)."""
    from tlxcv_tpu.models.classification import alexnet
    from tlxcv_tpu.utils.convert import chw_flatten_to_hwc, convert_by_order
    from tlxcv_tpu.core import pure, split
    import jax.numpy as jnp

    class TorchLayoutAlexNet(TAlexNet):
        def forward(self, x):  # standard torchvision CHW flatten
            x = F.adaptive_avg_pool2d(self.features(x), (6, 6))
            return self.classifier(torch.flatten(x, 1))

    t = TorchLayoutAlexNet().eval()
    m = alexnet(num_classes=10)
    sd = {k: v.detach().numpy() for k, v in t.state_dict().items()}
    sd["classifier.0.weight"] = chw_flatten_to_hwc(
        sd["classifier.0.weight"], 256, 6, 6)
    unmatched = convert_by_order(sd, m, source="torch")
    assert not unmatched

    x = _x(rng, 224, batch=1)
    with torch.no_grad():
        ref = t(torch.tensor(x)).numpy()
    params, state = split(m)
    out, _ = pure(m)(params, state,
                     jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-4, rtol=5e-4)
