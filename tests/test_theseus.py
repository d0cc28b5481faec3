"""Theseus-style module surgery utilities."""
import jax.numpy as jnp
import numpy as np

import tlxcv_tpu.nn as nn
from tlxcv_tpu.models import resnet18
from tlxcv_tpu.utils.theseus import (get_by_path, record_features,
                                     upgrade_sublayer)


def test_get_by_path_and_upgrade():
    m = resnet18(num_classes=4)
    conv = get_by_path(m, "layer1/layers/0/conv1")
    assert isinstance(conv, nn.Conv2d)
    hits = upgrade_sublayer(m, "fc", lambda old: nn.Linear(512, 7))
    assert hits == ["fc"]
    out = m(jnp.zeros((1, 64, 64, 3)))
    assert out.shape == (1, 7)


def test_record_features():
    m = resnet18(num_classes=4)
    store = record_features(m, ["layer2", "layer3"])
    m(jnp.zeros((1, 64, 64, 3)))
    assert store["layer2"].shape == (1, 8, 8, 128)
    assert store["layer3"].shape == (1, 4, 4, 256)
