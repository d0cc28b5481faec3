"""Layer-library numerics vs reference semantics (torch CPU as oracle).

The reference's models assume torch/paddle conv/pool geometry; we verify
our NHWC layers match torch NCHW numerics after transpose.
"""
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import tlxcv_tpu.nn as nn


def _nhwc(x_nchw):
    return jnp.asarray(np.transpose(x_nchw, (0, 2, 3, 1)))


def _to_nchw(y_nhwc):
    return np.transpose(np.asarray(y_nhwc), (0, 3, 1, 2))


@pytest.mark.parametrize("stride,padding,dilation,groups", [
    (1, 1, 1, 1), (2, 1, 1, 1), (1, 2, 2, 1), (2, 0, 1, 1), (1, 1, 1, 4),
])
def test_conv2d_matches_torch(rng, stride, padding, dilation, groups):
    cin, cout, k = 8, 12, 3
    x = rng.normal(size=(2, cin, 13, 15)).astype(np.float32)
    w = rng.normal(size=(cout, cin // groups, k, k)).astype(np.float32)
    b = rng.normal(size=(cout,)).astype(np.float32)

    ref = F.conv2d(torch.tensor(x), torch.tensor(w), torch.tensor(b),
                   stride=stride, padding=padding, dilation=dilation,
                   groups=groups).numpy()

    conv = nn.Conv2d(cin, cout, k, stride=stride, padding=padding,
                     dilation=dilation, groups=groups)
    # torch OIHW -> HWIO
    conv.weight.value = jnp.asarray(np.transpose(w, (2, 3, 1, 0)))
    conv.bias.value = jnp.asarray(b)
    out = _to_nchw(conv(_nhwc(x)))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-4)


@pytest.mark.parametrize("stride,padding,output_padding", [
    (2, 1, 1), (2, 0, 0), (1, 1, 0), (3, 1, 2),
])
def test_convtranspose2d_matches_torch(rng, stride, padding, output_padding):
    cin, cout, k = 6, 4, 3
    x = rng.normal(size=(2, cin, 9, 11)).astype(np.float32)
    w = rng.normal(size=(cin, cout, k, k)).astype(np.float32)  # torch IOHW

    ref = F.conv_transpose2d(torch.tensor(x), torch.tensor(w), stride=stride,
                             padding=padding, output_padding=output_padding).numpy()

    conv = nn.ConvTranspose2d(cin, cout, k, stride=stride, padding=padding,
                              output_padding=output_padding, bias=False)
    conv.weight.value = jnp.asarray(np.transpose(w, (2, 3, 0, 1)))  # IOHW -> HWIO
    out = _to_nchw(conv(_nhwc(x)))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-4)


@pytest.mark.parametrize("k,s,p", [(2, 2, 0), (3, 2, 1), (3, 1, 1)])
def test_maxpool_matches_torch(rng, k, s, p):
    x = rng.normal(size=(2, 5, 14, 14)).astype(np.float32)
    ref = F.max_pool2d(torch.tensor(x), k, s, p).numpy()
    out = _to_nchw(nn.MaxPool2d(k, s, p)(_nhwc(x)))
    np.testing.assert_allclose(out, ref, atol=1e-6)


@pytest.mark.parametrize("k,s,p", [(2, 2, 0), (3, 2, 1)])
def test_avgpool_matches_torch(rng, k, s, p):
    x = rng.normal(size=(2, 5, 14, 14)).astype(np.float32)
    ref = F.avg_pool2d(torch.tensor(x), k, s, p, count_include_pad=False).numpy()
    out = _to_nchw(nn.AvgPool2d(k, s, p)(_nhwc(x)))
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


def test_batchnorm_eval_matches_torch(rng):
    c = 7
    x = rng.normal(size=(2, c, 8, 8)).astype(np.float32)
    tbn = torch.nn.BatchNorm2d(c).eval()
    with torch.no_grad():
        tbn.running_mean.copy_(torch.tensor(rng.normal(size=(c,)).astype(np.float32)))
        tbn.running_var.copy_(torch.tensor(rng.uniform(0.5, 2.0, size=(c,)).astype(np.float32)))
        tbn.weight.copy_(torch.tensor(rng.normal(size=(c,)).astype(np.float32)))
        tbn.bias.copy_(torch.tensor(rng.normal(size=(c,)).astype(np.float32)))
        ref = tbn(torch.tensor(x)).numpy()

    bn = nn.BatchNorm(c)
    bn.running_mean.value = jnp.asarray(tbn.running_mean.numpy())
    bn.running_var.value = jnp.asarray(tbn.running_var.numpy())
    bn.weight.value = jnp.asarray(tbn.weight.detach().numpy())
    bn.bias.value = jnp.asarray(tbn.bias.detach().numpy())
    out = _to_nchw(bn(_nhwc(x)))
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


def test_layernorm_matches_torch(rng):
    x = rng.normal(size=(2, 5, 16)).astype(np.float32)
    tln = torch.nn.LayerNorm(16)
    with torch.no_grad():
        tln.weight.copy_(torch.tensor(rng.normal(size=(16,)).astype(np.float32)))
        tln.bias.copy_(torch.tensor(rng.normal(size=(16,)).astype(np.float32)))
        ref = tln(torch.tensor(x)).numpy()
    ln = nn.LayerNorm(16)
    ln.weight.value = jnp.asarray(tln.weight.detach().numpy())
    ln.bias.value = jnp.asarray(tln.bias.detach().numpy())
    np.testing.assert_allclose(np.asarray(ln(jnp.asarray(x))), ref, atol=1e-5, rtol=1e-5)


def test_groupnorm_matches_torch(rng):
    x = rng.normal(size=(2, 8, 6, 6)).astype(np.float32)
    tgn = torch.nn.GroupNorm(4, 8)
    ref = tgn(torch.tensor(x)).detach().numpy()
    gn = nn.GroupNorm(4, 8)
    out = _to_nchw(gn(_nhwc(x)))
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


def test_adaptive_avg_pool(rng):
    x = rng.normal(size=(2, 6, 14, 14)).astype(np.float32)
    ref = F.adaptive_avg_pool2d(torch.tensor(x), (7, 7)).numpy()
    out = _to_nchw(nn.AdaptiveAvgPool2d((7, 7))(_nhwc(x)))
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


def test_conv3d_shape(rng):
    x = jnp.asarray(rng.normal(size=(1, 8, 16, 16, 3)).astype(np.float32))
    conv = nn.Conv3d(3, 4, (3, 3, 3), stride=(1, 2, 2), padding="SAME")
    assert conv(x).shape == (1, 8, 8, 8, 4)


def test_adaptive_avg_pool_nondivisible_matches_torch():
    """Non-divisible bins use torch's exact floor/ceil bin means (the
    old bilinear-resize fallback interpolated instead of averaging)."""
    import numpy as np
    import torch
    import torch.nn.functional as F

    from tlxcv_tpu.nn.layers import AdaptiveAvgPool2d

    rng = np.random.default_rng(0)
    for (h, w, oh, ow) in [(64, 64, 3, 3), (17, 23, 5, 7)]:
        x = rng.normal(size=(2, h, w, 4)).astype(np.float32)
        ours = np.asarray(AdaptiveAvgPool2d((oh, ow))(jnp.asarray(x)))
        ref = F.adaptive_avg_pool2d(
            torch.from_numpy(x).permute(0, 3, 1, 2), (oh, ow))
        np.testing.assert_allclose(ours, ref.permute(0, 2, 3, 1).numpy(),
                                   rtol=1e-5, atol=1e-5)
