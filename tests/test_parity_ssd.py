"""SSD torch-oracle parity (golden battery -> 21 archs): MobileNetV1
trunk at conv11/conv13 + 4 extra blocks + box/score heads; raw head
outputs AND the prior-box delta decode match through the converter."""
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn

from tests.test_parity_zoo import _randomize_bn, _x
from tlxcv_tpu.core import pure, split
from tlxcv_tpu.utils.convert import convert_by_order

torch.manual_seed(5)


class TConvBNReLU(tnn.Module):
    def __init__(self, cin, cout, k, stride=1, padding=0, groups=1):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, k, stride, padding, groups=groups,
                               bias=False)
        self.bn = tnn.BatchNorm2d(cout)

    def forward(self, x):
        return torch.relu(self.bn(self.conv(x)))


class TDWSep(tnn.Module):
    def __init__(self, cin, cout, stride):
        super().__init__()
        self.dw = TConvBNReLU(cin, cin, 3, stride, 1, groups=cin)
        self.pw = TConvBNReLU(cin, cout, 1)

    def forward(self, x):
        return self.pw(self.dw(x))


class TExtra(tnn.Module):
    def __init__(self, cin, mid, cout):
        super().__init__()
        self.conv1 = TConvBNReLU(cin, mid, 1)
        self.conv2 = TConvBNReLU(mid, cout, 3, 2, 1)

    def forward(self, x):
        return self.conv2(self.conv1(x))


class TSSD(tnn.Module):
    CFG = [(64, 1), (128, 2), (128, 1), (256, 2), (256, 1), (512, 2),
           (512, 1), (512, 1), (512, 1), (512, 1), (512, 1),
           (1024, 2), (1024, 1)]

    def __init__(self, num_classes=3):
        super().__init__()
        self.stem = TConvBNReLU(3, 32, 3, 2, 1)
        blocks, cin = [], 32
        for out, stride in self.CFG:
            blocks.append(TDWSep(cin, out, stride))
            cin = out
        self.blocks = tnn.ModuleList(blocks)
        self.extras = tnn.ModuleList([
            TExtra(1024, 256, 512), TExtra(512, 128, 256),
            TExtra(256, 128, 256), TExtra(256, 64, 128)])
        chans = (512, 1024, 512, 256, 256, 128)
        priors = (3, 6, 6, 6, 6, 6)
        nc = num_classes + 1
        self.box_convs = tnn.ModuleList(
            tnn.Conv2d(c, p * 4, 1) for c, p in zip(chans, priors))
        self.score_convs = tnn.ModuleList(
            tnn.Conv2d(c, p * nc, 1) for c, p in zip(chans, priors))
        self.nc = nc

    def forward(self, x):
        x = self.stem(x)
        feats = []
        for i, b in enumerate(self.blocks):
            x = b(x)
            if i in (10, 12):
                feats.append(x)
        x = feats[-1]
        for blk in self.extras:
            x = blk(x)
            feats.append(x)
        boxes, scores = [], []
        for f, bc, sc in zip(feats, self.box_convs, self.score_convs):
            b = f.shape[0]
            # NHWC channel ordering: permute before the reshape so the
            # (priors*4) unpacking matches our channels-last head
            boxes.append(bc(f).permute(0, 2, 3, 1).reshape(b, -1, 4))
            scores.append(sc(f).permute(0, 2, 3, 1).reshape(b, -1, self.nc))
        return torch.cat(boxes, 1), torch.cat(scores, 1)


def test_ssd_parity(rng):
    from tlxcv_tpu.models.detection import SSD
    from tlxcv_tpu.models.detection.ssd import build_ssd_priors, ssd_decode

    model = SSD(num_classes=3, image_size=(128, 128))
    tmodel = TSSD(num_classes=3).eval()
    _randomize_bn(tmodel)
    unmatched = convert_by_order(
        {k: v.detach().numpy() for k, v in tmodel.state_dict().items()},
        model, source="torch")
    assert not unmatched

    x = _x(rng, 128)
    with torch.no_grad():
        ref_boxes, ref_scores = tmodel(torch.tensor(x))
    params, state = split(model)
    xj = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    # eval-mode raw head outputs (training mode would switch BN to batch
    # statistics and is not comparable to the torch eval run)
    (boxes, scores), _ = pure(
        model, lambda m, v: m.ssd_head(m.backbone(v)))(params, state, xj)
    np.testing.assert_allclose(np.asarray(boxes), ref_boxes.numpy(),
                               atol=5e-4, rtol=5e-4)
    np.testing.assert_allclose(np.asarray(scores), ref_scores.numpy(),
                               atol=5e-4, rtol=5e-4)

    # the decode agrees with an independent numpy derivation
    feats, _ = pure(model, lambda m, v: m.backbone(v))(params, state, xj)
    priors = build_ssd_priors([tuple(f.shape[1:3]) for f in feats],
                              (128, 128))
    dec = np.asarray(ssd_decode(boxes, priors))
    p = np.asarray(priors)
    bp = np.asarray(boxes)
    pw, ph = p[:, 2] - p[:, 0], p[:, 3] - p[:, 1]
    px, py = p[:, 0] + pw / 2, p[:, 1] + ph / 2
    ox = px + bp[..., 0] * pw * 0.1
    oy = py + bp[..., 1] * ph * 0.1
    ow = np.exp(bp[..., 2] * 0.2) * pw
    oh = np.exp(bp[..., 3] * 0.2) * ph
    ref_dec = np.stack([ox - ow / 2, oy - oh / 2, ox + ow / 2, oy + oh / 2],
                       -1)
    np.testing.assert_allclose(dec, ref_dec, atol=1e-5)
