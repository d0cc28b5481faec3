"""Space-to-depth stem rewrite — the MLPerf-ResNet TPU trick.

The canonical ResNet stem (7x7 stride-2 pad-3 conv on 3 input channels)
is the single worst-mapped op in the whole serving graph on this chip:
`demo/image_classification/profile_resnet_int8_stages.py` measures it at
~13 TFLOP/s int8 (3% of peak) while layer4 runs at 70% — a 7x7 window
striding over a 3-channel image gives the MXU a K=147 contraction fed
from a strided, channel-starved layout.

The rewrite is EXACT (bit-equal weight remapping, no retraining):
reorganize each 2x2 pixel block into channels (space-to-depth), then the
7x7/2 conv becomes a 4x4 stride-1 VALID conv over the blocked image —
K = 4*4*12 = 192, no striding, half the spatial extent.

    y[i,j] = sum_{d,e} w7[d,e] x[2i+d-3, 2j+e-3]          (orig, pad 3)
           = sum_{d,e} w8[d+1,e+1] x_pad[2i+d+1, 2j+e+1]  (pad 4 left)
           = sum_{u,v,a,b} w8[2u+a, 2v+b] z[i+u, j+v, (a,b,c)]

with w8 = w7 zero-padded by one row/col at the top/left and
z = space_to_depth(x padded (4, 2) per axis).  The (4, 2) asymmetric
padding makes the VALID conv output EXACTLY H/2 x W/2 — no trailing
slice, so the wrapped conv's output tensor feeds the following BatchNorm
directly and the ops.quant trace/fold/requantize machinery keeps
working (a slice between conv and BN would break fold_batchnorm's
id-adjacency and silently stop the int8 producer-side requantization at
the stem).

Apply BEFORE ops.quant.quantize_for_serving; forward-exact, so the
quantization calibration sees identical activations.  No reference
counterpart (the reference has no performance layer at all); the trick
itself is public TPU lore (MLPerf ResNet submissions).

MEASURED VERDICT (r4, real chip, int8 ResNet-50 b256 —
demo/image_classification/probe_s2d_stem.py / probe_s2d_variants.py):
**opt-in only; no e2e win on this chip.**  e2e 12,908 -> 12,362 img/s
(0.96x) with the blocking on-device; stem-stage-only orig 3.53 ms /
s2d-on-device 3.62 / s2d-pre-blocked 3.25.  The stem stage here is
HBM-bound, not MXU-mapping-bound: its conv output (112^2x64 x b256)
plus the maxpool read/write dominate, so fixing the contraction layout
moves ~0.3 ms of ~20 ms (and the device-side 2x2 blocking transpose —
lane dim 3->12, far below the 128-lane tile — costs more than that).
The profiler's "12.5 TFLOP/s stem" was a denominator artifact of a
bandwidth-bound stage.  Kept because it is exact, tested, and the
right call on hardware where the stem IS contraction-bound (feed
pre-blocked input and call `.conv` directly to skip the device
transform, as probe_s2d_variants.py variant (c) does).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .. import nn
from ..core.module import Module

__all__ = ["SpaceToDepthStem", "convert_stem_to_space_to_depth",
           "block_space_to_depth", "unblock_space_to_depth",
           "remap_conv3x3_s1"]


def block_space_to_depth(x, ph, pw):
    """NHWC -> [N, H/ph, W/pw, ph*pw*C], channel order (a, b, c)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ph, ph, w // pw, pw, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // ph, w // pw,
                                                 ph * pw * c)


def unblock_space_to_depth(z, ph, pw, c):
    """Inverse of :func:`block_space_to_depth`."""
    b, hh, ww, _ = z.shape
    return z.reshape(b, hh, ww, ph, pw, c).transpose(0, 1, 3, 2, 4, 5) \
            .reshape(b, ph * hh, pw * ww, c)


def remap_conv3x3_s1(w, ph, pw):
    """Exact blocked twin of a stride-1 3x3 SAME conv kernel.

    A 3x3 SAME conv on [H, W, c] equals a 3x3 SAME conv on the
    (ph, pw)-blocked layout with kernel (zero where d/e leave [0, 2]):

        W_blk[u+1, v+1, (a,b,c), (α,β,o)] = w[ph*u+a+1-α, pw*v+b+1-β, c, o]

    — the padded-block border rows multiply only structural zeros, so
    SAME padding in block space reproduces SAME padding in pixel space
    exactly for even H % ph == W % pw == 0 inputs.  The payoff: narrow-
    channel convs (c << the 128-lane MXU tile) shrink spatially ph*pw x
    while channels stay inside one lane tile — fewer padded MXU passes
    (HRNet layout-bound verdict, BENCHMARKS.md; probe:
    demo/image_segmentation/probe_hrnet_s2d.py).
    """
    w = np.asarray(w)
    if w.shape[:2] != (3, 3):
        raise ValueError(f"3x3 kernels only, got {w.shape}")
    c, o = w.shape[2], w.shape[3]
    wb = np.zeros((3, 3, ph, pw, c, ph, pw, o), w.dtype)
    for U in range(3):
        for a in range(ph):
            for al in range(ph):
                d = ph * (U - 1) + a + 1 - al
                if not 0 <= d <= 2:
                    continue
                for V in range(3):
                    for bb in range(pw):
                        for be in range(pw):
                            e = pw * (V - 1) + bb + 1 - be
                            if 0 <= e <= 2:
                                wb[U, V, a, bb, :, al, be, :] = w[d, e]
    return wb.reshape(3, 3, ph * pw * c, ph * pw * o)


class SpaceToDepthStem(Module):
    """Drop-in replacement for a 7x7/2 pad-3 stem ``nn.Conv2d``."""

    def __init__(self, conv: nn.Conv2d):
        w7 = np.asarray(conv.weight.value)
        if w7.shape[:2] != (7, 7) or tuple(conv.stride) != (2, 2):
            raise ValueError(f"not a 7x7/2 stem conv: {w7.shape}, "
                             f"stride {conv.stride}")
        if conv.padding != [(3, 3), (3, 3)] and \
                tuple(map(tuple, conv.padding)) != ((3, 3), (3, 3)):
            raise ValueError(f"stem must be pad-3, got {conv.padding}")
        if conv.groups != 1 or tuple(conv.dilation) != (1, 1):
            raise ValueError("grouped/dilated stems not supported")
        if w7.dtype == np.int8:
            raise ValueError("apply space-to-depth BEFORE quantization")
        c, o = w7.shape[2], w7.shape[3]
        w8 = np.zeros((8, 8, c, o), w7.dtype)
        w8[1:, 1:] = w7
        # [8,8,C,O] -> (u,a,v,b,C,O) -> (u,v,a,b,C,O) -> [4,4,4C,O];
        # channel order (a,b,c) matches the reshape-based s2d below
        w4 = w8.reshape(4, 2, 4, 2, c, o).transpose(0, 2, 1, 3, 4, 5) \
               .reshape(4, 4, 4 * c, o)
        self.in_channels = c
        # w_init from the rewritten kernel directly: the default kaiming
        # init would draw from core.init's GLOBAL host RNG before being
        # overwritten, perturbing init-RNG reproducibility for every
        # model built after a conversion (ADVICE r4)
        self.conv = nn.Conv2d(4 * c, o, 4, stride=1, padding=0,
                              bias=conv.bias is not None,
                              w_init=lambda s: jnp.asarray(w4))
        if conv.bias is not None:
            self.conv.bias = conv.bias

    def __call__(self, x):
        b, h, w, c = x.shape
        # (4, 2|3) padding: left 4 realigns the pad-3 window to even
        # offsets; right 2 (3 for odd dims) lands the VALID conv on
        # exactly ceil(H/2) outputs with no trailing slice
        x = jnp.pad(x, ((0, 0), (4, 2 + h % 2), (4, 2 + w % 2), (0, 0)))
        hp, wp = x.shape[1], x.shape[2]
        x = x.reshape(b, hp // 2, 2, wp // 2, 2, c) \
             .transpose(0, 1, 3, 2, 4, 5) \
             .reshape(b, hp // 2, wp // 2, 4 * c)
        return self.conv(x)


def convert_stem_to_space_to_depth(model, attr="conv1"):
    """Swap ``model.<attr>`` (a 7x7/2 stem conv) for its exact
    space-to-depth rewrite.  Returns the model."""
    conv = getattr(model, attr)
    if isinstance(conv, SpaceToDepthStem):
        return model
    setattr(model, attr, SpaceToDepthStem(conv))
    return model
