"""ReXNet (reference tlxcv/models/classification/rexnet.py,
paddle2tlx-converted), NHWC."""
from __future__ import annotations

from math import ceil

from ... import nn

__all__ = ["ReXNet", "rexnet_1_0", "rexnet_1_3"]


class SE(nn.Module):
    def __init__(self, ch, se_ratio=12):
        mid = ch // se_ratio
        self.fc1 = nn.Conv2d(ch, mid, 1)
        self.bn = nn.BatchNorm(mid)
        self.fc2 = nn.Conv2d(mid, ch, 1)

    def __call__(self, x):
        s = x.mean(axis=(1, 2), keepdims=True)
        s = nn.relu(self.bn(self.fc1(s)))
        return x * nn.sigmoid(self.fc2(s))


class LinearBottleneck(nn.Module):
    def __init__(self, cin, cout, t, stride, use_se=True):
        self.use_shortcut = stride == 1 and cin <= cout
        self.cin = cin
        layers = []
        ch = cin
        if t != 1:
            dw_ch = cin * t
            layers += [nn.Conv2d(cin, dw_ch, 1, bias=False),
                       nn.BatchNorm(dw_ch), nn.Activation("silu")]
            ch = dw_ch
        layers += [nn.Conv2d(ch, ch, 3, stride=stride, padding=1, groups=ch,
                             bias=False), nn.BatchNorm(ch)]
        self.body = nn.Sequential(*layers)
        self.se = SE(ch) if use_se else None
        self.act = nn.Activation("relu6")
        self.proj = nn.Sequential(nn.Conv2d(ch, cout, 1, bias=False),
                                  nn.BatchNorm(cout))
        self.cout = cout

    def __call__(self, x):
        out = self.body(x)
        if self.se is not None:
            out = self.se(out)
        out = self.proj(self.act(out))
        if self.use_shortcut:
            # ReXNet adds the input onto the first cin output channels
            import jax.numpy as jnp

            pad = self.cout - self.cin
            xp = jnp.pad(x, [(0, 0), (0, 0), (0, 0), (0, pad)])
            out = out + xp
        return out


class ReXNet(nn.Module):
    def __init__(self, width_mult=1.0, depth_mult=1.0, num_classes=1000,
                 use_se=True):
        layers = [1, 2, 2, 3, 3, 5]
        strides = [1, 2, 2, 2, 1, 2]
        layers = [ceil(l * depth_mult) for l in layers]
        depth = sum(layers)
        stem_ch = 32 / width_mult if width_mult < 1.0 else 32
        inplanes = 16 / width_mult if width_mult < 1.0 else 16
        final_ch = 180
        self.stem = nn.Sequential(
            nn.Conv2d(3, int(round(stem_ch * width_mult)), 3, stride=2,
                      padding=1, bias=False),
            nn.BatchNorm(int(round(stem_ch * width_mult))),
            nn.Activation("silu"))
        strides_full = sum([[s] + [1] * (l - 1)
                            for s, l in zip(strides, layers)], [])
        ts = [1] * layers[0] + [6] * (depth - layers[0])
        blocks = []
        cin = int(round(stem_ch * width_mult))
        cur = inplanes
        for i, (t, s) in enumerate(zip(ts, strides_full)):
            cout = int(round(cur * width_mult))
            blocks.append(LinearBottleneck(cin, cout, t, s,
                                           use_se=use_se and i > layers[0]))
            cin = cout
            cur += final_ch / depth
        self.blocks = blocks
        pen = int(1280 * max(1.0, width_mult))
        self.head = nn.Sequential(nn.Conv2d(cin, pen, 1, bias=False),
                                  nn.BatchNorm(pen), nn.Activation("silu"))
        self.pool = nn.GlobalAvgPool2d()
        self.drop = nn.Dropout(0.2)
        self.fc = nn.Linear(pen, num_classes)

    def __call__(self, x):
        x = self.stem(x)
        for b in self.blocks:
            x = b(x)
        x = self.pool(self.head(x))
        return self.fc(self.drop(x))


def rexnet_1_0(pretrained=False, **kw):
    return ReXNet(1.0, **kw)


def rexnet_1_3(pretrained=False, **kw):
    return ReXNet(1.3, **kw)
