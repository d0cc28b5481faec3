"""Golden-parity: full torch ResNet-18 -> converter -> our ResNet-18.

This reproduces the reference's verification strategy (README parity
tables, SURVEY.md §4.1) with torch as the oracle (no network access for
paddle CDN weights in this environment): identical topology, automated
order-based weight conversion, forward outputs must match.
"""
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn

from tlxcv_tpu.core import pure, split
from tlxcv_tpu.models import resnet18
from tlxcv_tpu.utils.convert import convert_by_order


class TorchBasicBlock(tnn.Module):
    def __init__(self, cin, cout, stride=1, downsample=None):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)
        self.downsample = downsample

    def forward(self, x):
        identity = x if self.downsample is None else self.downsample(x)
        out = torch.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return torch.relu(out + identity)


class TorchResNet18(tnn.Module):
    def __init__(self, num_classes=10):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)

        def layer(cin, cout, stride):
            down = None
            if stride != 1 or cin != cout:
                down = tnn.Sequential(
                    tnn.Conv2d(cin, cout, 1, stride, bias=False),
                    tnn.BatchNorm2d(cout))
            return tnn.Sequential(TorchBasicBlock(cin, cout, stride, down),
                                  TorchBasicBlock(cout, cout))

        self.layer1 = layer(64, 64, 1)
        self.layer2 = layer(64, 128, 2)
        self.layer3 = layer(128, 256, 2)
        self.layer4 = layer(256, 512, 2)
        self.fc = tnn.Linear(512, num_classes)

    def forward(self, x):
        x = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        x = x.mean(dim=(2, 3))
        return self.fc(x)


def _wire_order(model):
    """Our block defines downsample last; torch's state_dict emits it
    last too (declared after bn2) — orders align by construction."""
    return model


def test_resnet18_full_parity(rng):
    tmodel = TorchResNet18(num_classes=10).eval()
    # randomize BN stats so eval output actually exercises them
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.copy_(torch.randn_like(m.running_mean) * 0.1)
                m.running_var.copy_(torch.rand_like(m.running_var) + 0.5)

    model = resnet18(num_classes=10)
    unmatched = convert_by_order(
        {k: v.detach().numpy() for k, v in tmodel.state_dict().items()},
        model, source="torch")
    assert not unmatched

    x = rng.normal(size=(2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.tensor(x)).numpy()
    params, state = split(model)
    out, _ = pure(model)(params, state,
                         jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    # the README parity-table criterion: forward diff ~ 0
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=2e-4)
