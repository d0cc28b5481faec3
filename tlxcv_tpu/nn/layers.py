"""NHWC layer library (TPU-native).

One layout (NHWC), one dtype discipline (params f32, compute follows input
dtype; normalization statistics always f32).  Replaces the reference's
``tlx.nn`` layers and their NCHW/NHWC ``data_format`` duality
(reference tlxcv/models/detection/utils/ops.py:393-440 — deleted here).

Conv kernels are HWIO; dense kernels are (in, out).
"""
from __future__ import annotations

import math
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..core import init as I
from ..core.module import BatchStat, Module, Param, is_training, rng, has_rng

__all__ = [
    "Conv2d", "ConvTranspose2d", "Conv3d", "Linear", "Embedding",
    "BatchNorm", "BatchNorm2d", "LayerNorm", "GroupNorm", "InstanceNorm",
    "MaxPool2d", "AvgPool2d", "MaxPool3d", "AvgPool3d",
    "AdaptiveAvgPool2d", "GlobalAvgPool2d",
    "Dropout", "DropPath", "Identity", "Sequential", "Activation", "PReLU",
    "relu", "relu6", "gelu", "silu", "sigmoid", "softmax", "hardswish",
    "hardsigmoid", "leaky_relu", "mish", "tanh", "get_activation",
]


# --------------------------------------------------------------------------
# functional activations
# --------------------------------------------------------------------------
relu = jax.nn.relu
relu6 = jax.nn.relu6
gelu = jax.nn.gelu
silu = jax.nn.silu
sigmoid = jax.nn.sigmoid
softmax = jax.nn.softmax
tanh = jnp.tanh
hardswish = jax.nn.hard_swish
hardsigmoid = jax.nn.hard_sigmoid


def leaky_relu(x, negative_slope=0.01):
    return jax.nn.leaky_relu(x, negative_slope)


def mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


_ACTS: dict[str, tp.Callable] = {
    "relu": relu, "relu6": relu6, "gelu": gelu, "silu": silu, "swish": silu,
    "sigmoid": sigmoid, "tanh": tanh, "hardswish": hardswish,
    "hard_swish": hardswish, "hardsigmoid": hardsigmoid,
    "hard_sigmoid": hardsigmoid, "leaky_relu": leaky_relu, "leakyrelu": leaky_relu,
    "mish": mish, "identity": lambda x: x, "linear": lambda x: x,
}


def get_activation(act) -> tp.Callable:
    """Resolve an activation given a name, callable, or None."""
    if act is None:
        return lambda x: x
    if callable(act):
        return act
    try:
        return _ACTS[act.lower()]
    except KeyError:
        raise ValueError(f"unknown activation {act!r}") from None


class Activation(Module):
    def __init__(self, act):
        self.fn = get_activation(act)

    def __call__(self, x):
        return self.fn(x)


class Identity(Module):
    def __call__(self, x, *a, **k):
        return x


class PReLU(Module):
    """Parametric ReLU with a learnable negative slope (one shared scalar
    by default, torch/paddle convention)."""

    def __init__(self, num_parameters=1, init=0.25):
        self.weight = Param(jnp.full((num_parameters,), init, jnp.float32))

    def __call__(self, x):
        a = self.weight.value.astype(x.dtype)
        return jnp.where(x >= 0, x, a * x)


class Sequential(Module):
    def __init__(self, *layers):
        if len(layers) == 1 and isinstance(layers[0], (list, tuple)):
            layers = tuple(layers[0])
        self.layers = list(layers)

    def __call__(self, x):
        for layer in self.layers:
            x = layer(x)
        return x

    def __getitem__(self, i):
        return self.layers[i]

    def __len__(self):
        return len(self.layers)


# --------------------------------------------------------------------------
# padding helpers
# --------------------------------------------------------------------------
def _pair(v):
    return tuple(v) if isinstance(v, (tuple, list)) else (v, v)


def _conv_padding(padding, kernel, stride, dilation, nd=2):
    """Normalize padding spec to lax form.

    Accepts 'SAME'/'VALID', int, per-dim ints, or explicit ((lo,hi),...).
    Integer padding matches torch/paddle semantics (symmetric explicit pad),
    which is what the reference models use everywhere.
    """
    if isinstance(padding, str):
        return padding.upper()
    if isinstance(padding, int):
        return [(padding, padding)] * nd
    padding = list(padding)
    if all(isinstance(p, int) for p in padding):
        return [(p, p) for p in padding]
    return [tuple(p) for p in padding]


def _fake_quant_w(w):
    """Per-out-channel symmetric int8 fake-quant with a straight-through
    estimator (QAT — enabled via ops.quant.enable_qat).  Bit-aligned with
    ops.quant.quantize_weights (same scale formula, same clip), so the
    QAT forward sees exactly the weight the int8 serving path will load;
    the STE passes the loss gradient through to the float master."""
    f = w.astype(jnp.float32)
    axis = tuple(range(f.ndim - 1))  # HWIO / (in, out): out last
    s = jnp.maximum(jnp.max(jnp.abs(f), axis=axis) / 127.0, 1e-12)
    q = jnp.clip(jnp.round(f / s), -127, 127) * s
    return (f + lax.stop_gradient(q - f)).astype(w.dtype)


def _fake_quant_a(x, s_in):
    """Static activation fake-quant (scalar calibrated scale), STE on x —
    mirrors the full-int8 serving path's input quantization."""
    f = x.astype(jnp.float32)
    q = jnp.clip(jnp.round(f / s_in), -127, 127) * s_in
    return (f + lax.stop_gradient(q - f)).astype(x.dtype)


def _qat_wx(mod, w, x):
    """Apply QAT fake-quant to (w, x) per the module's enable_qat flags."""
    if getattr(mod, "_qat", False):
        w = _fake_quant_w(w)
        if getattr(mod, "_qat_act", False) and \
                getattr(mod, "a_scale", None) is not None:
            x = _fake_quant_a(x, mod.a_scale.value)
    return w, x


# --------------------------------------------------------------------------
# Conv / Linear / Embedding
# --------------------------------------------------------------------------
class Conv2d(Module):
    """2D convolution, NHWC activations, HWIO weights.

    Maps onto the MXU via lax.conv_general_dilated; XLA fuses the bias add
    and any following elementwise op.
    """

    def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                 padding=0, dilation=1, groups=1, bias=True,
                 w_init=None, b_init=None):
        kh, kw = _pair(kernel_size)
        self.stride = _pair(stride)
        self.dilation = _pair(dilation)
        self.groups = groups
        self.padding = _conv_padding(padding, (kh, kw), self.stride, self.dilation)
        shape = (kh, kw, in_channels // groups, out_channels)
        w = w_init(shape) if callable(w_init) else I.kaiming_normal(shape, mode="fan_out")
        self.weight = Param(w)
        if bias:
            b = b_init((out_channels,)) if callable(b_init) else I.zeros((out_channels,))
            self.bias = Param(b)
        else:
            self.bias = None

    def __call__(self, x):
        w = self.weight.value
        if w.dtype == jnp.int8:
            return self._int8_call(x, w)
        w, x = _qat_wx(self, w, x)
        w = w.astype(x.dtype)
        y = lax.conv_general_dilated(
            x, w,
            window_strides=self.stride,
            padding=self.padding,
            rhs_dilation=self.dilation,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.groups,
        )
        if self.bias is not None:
            y = y + self.bias.value.astype(y.dtype)
        return y

    def _int8_call(self, x, w):
        """Quantized serving path (ops.quant): int8 weights with
        per-output-channel scales; when an activation scale has been
        calibrated the conv runs int8 x int8 -> int32 on the MXU (2x
        bf16 peak on v5e), else weight-only dequantized bf16.

        Producer-side requantization (ops.quant.fuse_requantize): with
        ``out_scale`` set, the int32 accumulator is scaled + biased (+
        folded ReLU) and requantized to int8 inside this conv's own XLA
        output fusion, so the inter-layer HBM buffer is 1 byte/elt and
        the consumer (which then receives ``x.dtype == int8``) skips
        its activation quantize entirely."""
        int8_in = x.dtype == jnp.int8
        # int8-in happens only on the fused serving path, which is bf16
        # between blocks — f32 here would double block-boundary buffers
        out_dtype = x.dtype if x.dtype in (jnp.float32, jnp.bfloat16) \
            else (jnp.bfloat16 if int8_in else jnp.float32)
        w_scale = self.w_scale.value  # [Cout] f32
        a_scale = getattr(self, "a_scale", None)
        if a_scale is not None:
            s_in = a_scale.value  # scalar f32
            if int8_in:
                xq = x  # producer already emitted this layer's quantization
            else:
                xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s_in),
                              -127, 127).astype(jnp.int8)
            y = lax.conv_general_dilated(
                xq, w, window_strides=self.stride, padding=self.padding,
                rhs_dilation=self.dilation,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=self.groups,
                preferred_element_type=jnp.int32)
            y = y.astype(jnp.float32) * (s_in * w_scale)
            if self.bias is not None:
                y = y + self.bias.value
            out_scale = getattr(self, "out_scale", None)
            if out_scale is not None:
                if getattr(self, "relu_fused", False):
                    y = jnp.maximum(y, 0.0)
                return jnp.clip(jnp.round(y / out_scale.value),
                                -127, 127).astype(jnp.int8)
            return y.astype(out_dtype)
        wf = (w.astype(jnp.float32) * w_scale).astype(out_dtype)
        y = lax.conv_general_dilated(
            x, wf, window_strides=self.stride, padding=self.padding,
            rhs_dilation=self.dilation,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.groups)
        if self.bias is not None:
            y = y + self.bias.value.astype(y.dtype)
        return y.astype(out_dtype)


class ConvTranspose2d(Module):
    """Transposed 2D convolution (NHWC), torch-compatible geometry."""

    def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                 padding=0, output_padding=0, bias=True, groups=1, w_init=None):
        kh, kw = _pair(kernel_size)
        self.stride = _pair(stride)
        self.pad = _pair(padding)
        self.output_padding = _pair(output_padding)
        self.groups = groups
        self.kernel = (kh, kw)
        # HWIO with I = in/groups; torch (in, out/g, kh, kw) converts via
        # reshape(g, in/g, out/g, kh, kw) -> transpose -> (kh, kw, in/g, out)
        shape = (kh, kw, in_channels // groups, out_channels)
        w = w_init(shape) if callable(w_init) else I.kaiming_normal(shape, mode="fan_out")
        self.weight = Param(w)
        self.bias = Param(I.zeros((out_channels,))) if bias else None

    def __call__(self, x):
        kh, kw = self.kernel
        sh, sw = self.stride
        ph, pw = self.pad
        oph, opw = self.output_padding
        w = self.weight.value.astype(x.dtype)
        # torch convtranspose == lhs-dilated conv with flipped kernel
        y = lax.conv_general_dilated(
            x, jnp.flip(w, (0, 1)),
            window_strides=(1, 1),
            padding=[(kh - 1 - ph, kh - 1 - ph + oph), (kw - 1 - pw, kw - 1 - pw + opw)],
            lhs_dilation=(sh, sw),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.groups,
        )
        if self.bias is not None:
            y = y + self.bias.value.astype(y.dtype)
        return y


class Conv3d(Module):
    """3D convolution, NDHWC activations, DHWIO weights (I3D video nets)."""

    def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                 padding="SAME", bias=True, w_init=None):
        if isinstance(kernel_size, int):
            kernel_size = (kernel_size,) * 3
        if isinstance(stride, int):
            stride = (stride,) * 3
        self.stride = tuple(stride)
        self.padding = _conv_padding(padding, kernel_size, stride, (1, 1, 1), nd=3)
        shape = tuple(kernel_size) + (in_channels, out_channels)
        w = w_init(shape) if callable(w_init) else I.kaiming_normal(shape, mode="fan_out")
        self.weight = Param(w)
        self.bias = Param(I.zeros((out_channels,))) if bias else None

    def __call__(self, x):
        w = self.weight.value.astype(x.dtype)
        y = lax.conv_general_dilated(
            x, w,
            window_strides=self.stride,
            padding=self.padding,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        if self.bias is not None:
            y = y + self.bias.value.astype(y.dtype)
        return y


class Linear(Module):
    def __init__(self, in_features, out_features, bias=True, w_init=None, b_init=None):
        shape = (in_features, out_features)
        w = w_init(shape) if callable(w_init) else I.kaiming_uniform(shape, nonlinearity="linear")
        self.weight = Param(w)
        if bias:
            b = b_init((out_features,)) if callable(b_init) else I.zeros((out_features,))
            self.bias = Param(b)
        else:
            self.bias = None

    def __call__(self, x):
        w = self.weight.value
        if w.dtype == jnp.int8:
            out_dtype = x.dtype if x.dtype in (jnp.float32, jnp.bfloat16) \
                else jnp.float32
            return self._int8_call(x, w, out_dtype)
        w, x = _qat_wx(self, w, x)
        y = jnp.dot(x, w.astype(x.dtype), preferred_element_type=x.dtype)
        if self.bias is not None:
            y = y + self.bias.value.astype(y.dtype)
        return y

    def _int8_call(self, x, w, out_dtype):
        w_scale = self.w_scale.value  # [out] f32
        a_scale = getattr(self, "a_scale", None)
        if a_scale is not None:
            s_in = a_scale.value
            xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s_in),
                          -127, 127).astype(jnp.int8)
            y = jnp.dot(xq, w, preferred_element_type=jnp.int32)
            y = y.astype(jnp.float32) * (s_in * w_scale)
        else:
            wf = (w.astype(jnp.float32) * w_scale).astype(out_dtype)
            y = jnp.dot(x, wf, preferred_element_type=out_dtype)
        if self.bias is not None:
            y = y + self.bias.value.astype(y.dtype)
        return y.astype(out_dtype)


class Embedding(Module):
    def __init__(self, num_embeddings, features, w_init=None):
        w = w_init((num_embeddings, features)) if callable(w_init) else \
            I.normal((num_embeddings, features), std=0.02)
        self.weight = Param(w)

    def __call__(self, ids):
        return jnp.take(self.weight.value, ids, axis=0)


# --------------------------------------------------------------------------
# Normalization
# --------------------------------------------------------------------------
class BatchNorm(Module):
    """Batch normalization over all axes except the last (channel) axis.

    Running stats are f32 BatchStat variables updated functionally when
    called under ``training=True`` (SURVEY.md §7 design stance: stats flow
    through the pure-function state dict, no in-place backend mutation).
    """

    def __init__(self, num_features, eps=1e-5, momentum=0.9, affine=True):
        self.eps = eps
        self.momentum = momentum
        if affine:
            self.weight = Param(I.ones((num_features,)))
            self.bias = Param(I.zeros((num_features,)))
        else:
            self.weight = self.bias = None
        self.running_mean = BatchStat(I.zeros((num_features,)))
        self.running_var = BatchStat(I.ones((num_features,)))

    def __call__(self, x):
        if getattr(self, "_folded", False):
            # folded into the producing conv (ops.quant.fold_batchnorm);
            # serving-only — running stats already live in the conv
            if is_training():
                raise RuntimeError(
                    "BatchNorm was folded for serving; it cannot be "
                    "trained (rebuild the model for training)")
            return x
        reduce_axes = tuple(range(x.ndim - 1))
        if is_training():
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=reduce_axes)
            var = jnp.var(xf, axis=reduce_axes)
            m = self.momentum
            # torch updates running_var with the UNBIASED batch variance
            # (normalization itself uses the biased one)
            n = 1
            for ax in reduce_axes:
                n *= x.shape[ax]
            var_u = var * (n / max(n - 1, 1))
            self.running_mean.value = m * self.running_mean.value + (1 - m) * mean
            self.running_var.value = m * self.running_var.value + (1 - m) * var_u
        else:
            mean = self.running_mean.value
            var = self.running_var.value
        scale = lax.rsqrt(var + self.eps)
        if self.weight is not None:
            scale = scale * self.weight.value
        offset = -mean * scale
        if self.bias is not None:
            offset = offset + self.bias.value
        return x * scale.astype(x.dtype) + offset.astype(x.dtype)


BatchNorm2d = BatchNorm  # NHWC: same reduction for 1d/2d/3d inputs


class LayerNorm(Module):
    def __init__(self, num_features, eps=1e-5, affine=True):
        self.eps = eps
        if affine:
            self.weight = Param(I.ones((num_features,)))
            self.bias = Param(I.zeros((num_features,)))
        else:
            self.weight = self.bias = None

    def __call__(self, x):
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        y = (xf - mean) * lax.rsqrt(var + self.eps)
        if self.weight is not None:
            y = y * self.weight.value + self.bias.value
        return y.astype(x.dtype)


class InstanceNorm(Module):
    """Instance normalization over spatial dims (NHWC), used by the GAN
    generators (PaddleGAN convention: no running stats)."""

    def __init__(self, num_features, eps=1e-5, affine=True):
        self.eps = eps
        if affine:
            self.weight = Param(I.ones((num_features,)))
            self.bias = Param(I.zeros((num_features,)))
        else:
            self.weight = self.bias = None

    def __call__(self, x):
        xf = x.astype(jnp.float32)
        axes = tuple(range(1, x.ndim - 1))
        mean = jnp.mean(xf, axis=axes, keepdims=True)
        var = jnp.var(xf, axis=axes, keepdims=True)
        y = (xf - mean) * lax.rsqrt(var + self.eps)
        if self.weight is not None:
            y = y * self.weight.value + self.bias.value
        return y.astype(x.dtype)


class GroupNorm(Module):
    def __init__(self, num_groups, num_channels, eps=1e-5, affine=True):
        assert num_channels % num_groups == 0
        self.num_groups = num_groups
        self.eps = eps
        if affine:
            self.weight = Param(I.ones((num_channels,)))
            self.bias = Param(I.zeros((num_channels,)))
        else:
            self.weight = self.bias = None

    def __call__(self, x):
        shape = x.shape
        g = self.num_groups
        xf = x.astype(jnp.float32).reshape(shape[:-1] + (g, shape[-1] // g))
        axes = tuple(range(1, xf.ndim - 2)) + (xf.ndim - 1,)
        mean = jnp.mean(xf, axis=axes, keepdims=True)
        var = jnp.var(xf, axis=axes, keepdims=True)
        y = ((xf - mean) * lax.rsqrt(var + self.eps)).reshape(shape)
        if self.weight is not None:
            y = y * self.weight.value + self.bias.value
        return y.astype(x.dtype)


# --------------------------------------------------------------------------
# Pooling
# --------------------------------------------------------------------------
def _pool(x, kind, window, stride, padding, nd=2):
    window = _pair(window) if nd == 2 else (window,) * nd if isinstance(window, int) else tuple(window)
    stride = window if stride is None else (
        _pair(stride) if nd == 2 else (stride,) * nd if isinstance(stride, int) else tuple(stride))
    dims = (1,) + tuple(window) + (1,)
    strides = (1,) + tuple(stride) + (1,)
    if isinstance(padding, str):
        pads = padding.upper()
    else:
        p = _pair(padding) if nd == 2 else (padding,) * nd if isinstance(padding, int) else tuple(padding)
        pads = [(0, 0)] + [(pi, pi) for pi in p] + [(0, 0)]
    if kind == "max":
        # -inf init makes JAX lower this to reduce_window_max, which has a
        # select-and-scatter VJP (finfo.min would block autodiff)
        neg = (-jnp.inf if jnp.issubdtype(x.dtype, jnp.floating)
               else np.asarray(jnp.iinfo(x.dtype).min, x.dtype))
        return lax.reduce_window(x, neg, lax.max, dims, strides, pads)
    # average pooling that excludes padding (torch count_include_pad=False ≈
    # paddle exclusive=True, what the reference models assume)
    summed = lax.reduce_window(x.astype(jnp.float32), 0.0, lax.add, dims, strides, pads)
    ones = jnp.ones(x.shape[:-1] + (1,), jnp.float32)
    counts = lax.reduce_window(ones, 0.0, lax.add, dims, strides, pads)
    return (summed / counts).astype(x.dtype)


class MaxPool2d(Module):
    def __init__(self, kernel_size, stride=None, padding=0):
        self.k, self.s, self.p = kernel_size, stride, padding

    def __call__(self, x):
        return _pool(x, "max", self.k, self.s, self.p)


class AvgPool2d(Module):
    def __init__(self, kernel_size, stride=None, padding=0):
        self.k, self.s, self.p = kernel_size, stride, padding

    def __call__(self, x):
        return _pool(x, "avg", self.k, self.s, self.p)


class MaxPool3d(Module):
    def __init__(self, kernel_size, stride=None, padding=0):
        self.k, self.s, self.p = kernel_size, stride, padding

    def __call__(self, x):
        return _pool(x, "max", self.k, self.s, self.p, nd=3)


class AvgPool3d(Module):
    def __init__(self, kernel_size, stride=None, padding=0):
        self.k, self.s, self.p = kernel_size, stride, padding

    def __call__(self, x):
        return _pool(x, "avg", self.k, self.s, self.p, nd=3)


class AdaptiveAvgPool2d(Module):
    """Adaptive average pool to a fixed (h, w) output (NHWC)."""

    def __init__(self, output_size):
        self.output_size = _pair(output_size)

    def __call__(self, x):
        oh, ow = self.output_size
        n, h, w, c = x.shape
        if h % oh == 0 and w % ow == 0:
            x = x.reshape(n, oh, h // oh, ow, w // ow, c)
            return jnp.mean(x, axis=(2, 4))
        # non-divisible: torch's exact bin means — output bin i averages
        # input rows [floor(i*H/oh), ceil((i+1)*H/oh)).  Expressed as two
        # static averaging matmuls (MXU-friendly); a bilinear resize here
        # (the old fallback) interpolates instead of averaging and
        # breaks parity with torch adaptive_avg_pool2d on PSP-style bins.
        import numpy as _np

        def avg_mat(inp, out):
            m = _np.zeros((out, inp), _np.float32)
            for i in range(out):
                a = (i * inp) // out
                b = -(-((i + 1) * inp) // out)
                m[i, a:b] = 1.0 / (b - a)
            return jnp.asarray(m)

        ah = avg_mat(h, oh)
        aw = avg_mat(w, ow)
        xf = x.astype(jnp.float32)
        out = jnp.einsum("ih,nhwc->niwc", ah, xf)
        out = jnp.einsum("jw,niwc->nijc", aw, out)
        return out.astype(x.dtype)


class GlobalAvgPool2d(Module):
    def __init__(self, keepdims=False):
        self.keepdims = keepdims

    def __call__(self, x):
        return jnp.mean(x, axis=(1, 2), keepdims=self.keepdims)


# --------------------------------------------------------------------------
# Regularization
# --------------------------------------------------------------------------
class Dropout(Module):
    def __init__(self, p=0.5):
        self.p = p

    def __call__(self, x):
        if not is_training() or self.p == 0.0:
            return x
        keep = 1.0 - self.p
        mask = jax.random.bernoulli(rng("dropout"), keep, x.shape)
        return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


class DropPath(Module):
    """Stochastic depth: drop the whole residual branch per sample."""

    def __init__(self, p=0.0):
        self.p = p

    def __call__(self, x):
        if not is_training() or self.p == 0.0:
            return x
        keep = 1.0 - self.p
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng("dropout"), keep, shape)
        return jnp.where(mask, x / keep, 0.0).astype(x.dtype)
