"""AOT serving export (utils/export.py): StableHLO artifact with baked
weights, polymorphic batch, and no model code at load time."""
import jax
import jax.numpy as jnp
import numpy as np

from tlxcv_tpu.core import pure, split
from tlxcv_tpu.utils.export import export_model, load_exported, save_exported


def test_export_roundtrip_polymorphic_batch(tmp_path, rng):
    import tlxcv_tpu.nn as nn

    class Tiny(nn.Module):
        def __init__(self):
            self.conv = nn.Conv2d(3, 8, 3, stride=2, padding=1)
            self.bn = nn.BatchNorm(8)
            self.fc = nn.Linear(8, 5)

        def __call__(self, x):
            x = nn.relu(self.bn(self.conv(x)))
            return self.fc(x.mean((1, 2)))

    m = Tiny()
    art = export_model(m, (16, 16, 3))
    path = str(tmp_path / "tiny.stablehlo")
    n = save_exported(path, art)
    assert n > 1000
    serve = load_exported(path)
    for b in (1, 3, 7):  # one artifact, any batch size
        x = jnp.asarray(rng.normal(size=(b, 16, 16, 3)), jnp.float32)
        ref, _ = pure(m)(*split(m), x)
        np.testing.assert_allclose(np.asarray(serve(x)), np.asarray(ref),
                                   atol=1e-5)


def test_export_int8_quantized(tmp_path, rng):
    """Quantized weights + scales are baked constants — the int8 serving
    path exports like any other."""
    import tlxcv_tpu.nn as nn
    from tlxcv_tpu.ops.quant import quantize_weights

    class Tiny(nn.Module):
        def __init__(self):
            self.fc1 = nn.Linear(12, 24)
            self.fc2 = nn.Linear(24, 4)

        def __call__(self, x):
            return self.fc2(nn.relu(self.fc1(x)))

    m = Tiny()
    x = jnp.asarray(rng.normal(size=(4, 12)), jnp.float32)
    ref, _ = pure(m)(*split(m), x)
    quantize_weights(m)
    art = export_model(m, (12,))
    serve = load_exported(str(save_path(tmp_path, art)))
    out = serve(x)
    cos = float((ref * out).sum() /
                (jnp.linalg.norm(ref) * jnp.linalg.norm(out) + 1e-12))
    assert cos > 0.999


def save_path(tmp_path, art):
    p = tmp_path / "m.stablehlo"
    save_exported(str(p), art)
    return p


import pytest


def test_export_multi_platform_from_cpu_host(tmp_path, rng):
    """Cross-platform lowering: a CPU host builds ONE artifact that
    carries both tpu and cpu lowerings (build box != serving box)."""
    import tlxcv_tpu.nn as nn

    class Tiny(nn.Module):
        def __init__(self):
            self.fc = nn.Linear(8, 3)

        def __call__(self, x):
            return self.fc(x)

    m = Tiny()
    art = export_model(m, (8,), platforms=("tpu", "cpu"))
    assert art.platforms == ("tpu", "cpu")
    serve = load_exported(str(save_path(tmp_path, art)))
    x = jnp.asarray(rng.normal(size=(4, 8)), jnp.float32)
    ref, _ = pure(m)(*split(m), x)
    np.testing.assert_allclose(np.asarray(serve(x)), np.asarray(ref),
                               atol=1e-5)


def test_export_sharded_multi_device(tmp_path, rng):
    """Multi-device serving artifact: batch sharded over the virtual
    8-device mesh serializes with its topology and round-trips exact."""
    import tlxcv_tpu.nn as nn
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tlxcv_tpu.parallel import make_mesh

    mesh = make_mesh(8, 1)
    shard = NamedSharding(mesh, P("data"))

    class Tiny(nn.Module):
        def __init__(self):
            self.fc1 = nn.Linear(16, 32)
            self.fc2 = nn.Linear(32, 4)

        def __call__(self, x):
            return self.fc2(nn.relu(self.fc1(x)))

    m = Tiny()
    art = export_model(m, (16,), batch=16, sharding=shard)
    assert art.nr_devices == 8
    serve = load_exported(str(save_path(tmp_path, art)))
    x = jnp.asarray(rng.normal(size=(16, 16)), jnp.float32)
    ref, _ = pure(m)(*split(m), x)
    out = serve(jax.device_put(x, shard))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


@pytest.mark.slow
def test_export_full_detector_predict_path(tmp_path, rng):
    """The whole serving graph — backbone + head + box decode + the
    K-step NMS scan — exports as ONE artifact (nothing host-side in the
    eval path)."""
    from tlxcv_tpu.models.detection import SSD

    m = SSD(num_classes=4, image_size=(128, 128))
    art = export_model(m, (128, 128, 3))
    serve = load_exported(str(save_path(tmp_path, art)))
    x = jnp.asarray(rng.normal(size=(2, 128, 128, 3)), jnp.float32)
    (rd, rc), _ = pure(m)(*split(m), x, training=False)
    od, oc = serve(x)
    assert (np.asarray(rc) == np.asarray(oc)).all()
    np.testing.assert_array_equal(np.asarray(rd), np.asarray(od))
