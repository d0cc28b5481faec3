"""Zoo parity wave 21: YOLOv3 torch oracle — DarkNet-53 trunk, top-down
FPN with YoloDetBlocks, and the raw per-level head outputs matched
end-to-end (reference tlxcv/models/detection/yolov3.py +
backbones/darknet.py); completes full-model oracles for all four
detectors (SSD/DETR waves 2-3, PPYOLOE wave 20).
"""
import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

from tests.test_parity_zoo import _randomize_bn
from tlxcv_tpu.core import split
from tlxcv_tpu.utils.convert import convert_by_order

torch.manual_seed(20)


class TConvBN(tnn.Module):
    def __init__(self, cin, cout, k=3, stride=1, padding=0):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, k, stride, padding, bias=False)
        self.bn = tnn.BatchNorm2d(cout)

    def forward(self, x):
        return F.leaky_relu(self.bn(self.conv(x)), 0.1)


class TDown(tnn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv = TConvBN(cin, cout, 3, 2, 1)

    def forward(self, x):
        return self.conv(x)


class TDarkBasic(tnn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv1 = TConvBN(cin, cout, 1, 1, 0)
        self.conv2 = TConvBN(cout, cout * 2, 3, 1, 1)

    def forward(self, x):
        return x + self.conv2(self.conv1(x))


class TBlocks(tnn.Module):
    def __init__(self, cin, cout, count):
        super().__init__()
        self.blocks = tnn.ModuleList(
            TDarkBasic(cin if i == 0 else cout * 2, cout)
            for i in range(count))

    def forward(self, x):
        for b in self.blocks:
            x = b(x)
        return x


class TDarkNet53(tnn.Module):
    def __init__(self, return_idx=(2, 3, 4)):
        super().__init__()
        self.return_idx = return_idx
        self.conv0 = TConvBN(3, 32, 3, 1, 1)
        self.downsample0 = TDown(32, 64)
        stages, downs, cin = [], [], 64
        for i, count in enumerate((1, 2, 8, 8, 4)):
            out = 32 * (2 ** i)
            stages.append(TBlocks(cin, out, count))
            cin = out * 2
            if i < 4:
                downs.append(TDown(cin, cin * 2))
                cin = cin * 2
        self.stages = tnn.ModuleList(stages)
        self.downsamples = tnn.ModuleList(downs)

    def forward(self, x):
        x = self.downsample0(self.conv0(x))
        outs = []
        for i, stage in enumerate(self.stages):
            x = stage(x)
            if i in self.return_idx:
                outs.append(x)
            if i < 4:
                x = self.downsamples[i](x)
        return outs


class TYoloDetBlock(tnn.Module):
    def __init__(self, cin, channel):
        super().__init__()
        defs = [(cin, channel, 1), (channel, channel * 2, 3),
                (channel * 2, channel, 1), (channel, channel * 2, 3),
                (channel * 2, channel, 1)]
        self.conv_module = tnn.Sequential(*[
            TConvBN(ci, co, k, 1, (k - 1) // 2) for ci, co, k in defs])
        self.tip = TConvBN(channel, channel * 2, 3, 1, 1)

    def forward(self, x):
        route = self.conv_module(x)
        return route, self.tip(route)


class TYOLOv3FPN(tnn.Module):
    def __init__(self, in_channels=(256, 512, 1024)):
        super().__init__()
        self.num_blocks = len(in_channels)
        blocks, routes = [], []
        for i, ch in enumerate(reversed(in_channels)):
            if i > 0:
                ch += 512 // (2 ** i)
            channel = 512 // (2 ** i)
            blocks.append(TYoloDetBlock(ch, channel))
            if i < self.num_blocks - 1:
                routes.append(TConvBN(channel, channel // 2, 1, 1, 0))
        self.yolo_blocks = tnn.ModuleList(blocks)
        self.routes = tnn.ModuleList(routes)

    def forward(self, feats):
        feats = feats[::-1]
        outs, route = [], None
        for i, x in enumerate(feats):
            if i > 0:
                x = torch.cat([route, x], 1)
            route, tip = self.yolo_blocks[i](x)
            outs.append(tip)
            if i < self.num_blocks - 1:
                route = self.routes[i](route)
                route = F.interpolate(route, scale_factor=2, mode="nearest")
        return outs


class TYOLOv3(tnn.Module):
    def __init__(self, num_classes=4):
        super().__init__()
        self.backbone = TDarkNet53()
        self.neck = TYOLOv3FPN()
        self.yolo_outputs = tnn.ModuleList(
            tnn.Conv2d(ch, 3 * (num_classes + 5), 1)
            for ch in (1024, 512, 256))

    def forward(self, x):
        feats = self.neck(self.backbone(x))
        return [conv(f) for conv, f in zip(self.yolo_outputs, feats)]


def test_yolov3_parity(rng):
    from tlxcv_tpu.models.detection import YOLOv3

    tm = TYOLOv3().eval()
    _randomize_bn(tm)
    model = YOLOv3(num_classes=4)
    unmatched = convert_by_order(
        {k: v.detach().numpy() for k, v in tm.state_dict().items()},
        model, source="torch")
    assert not unmatched, unmatched
    x = rng.normal(size=(1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        refs = tm(torch.tensor(x))
    import jax.numpy as jnp

    split(model)
    outs = model.head_outputs(jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert len(outs) == 3
    for out, ref in zip(outs, refs):
        np.testing.assert_allclose(np.asarray(out),
                                   ref.numpy().transpose(0, 2, 3, 1),
                                   atol=1e-3, rtol=1e-3)
