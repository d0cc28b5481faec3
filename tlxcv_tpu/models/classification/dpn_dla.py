"""DPN and DLA (reference tlxcv/models/classification/{dpn.py, dla.py},
paddle2tlx-converted), NHWC."""
from __future__ import annotations

import jax.numpy as jnp

from ... import nn

__all__ = ["DPN", "dpn68", "DLA", "dla34"]


class BnActConv(nn.Module):
    def __init__(self, cin, cout, k, stride=1, groups=1):
        self.bn = nn.BatchNorm(cin)
        self.conv = nn.Conv2d(cin, cout, k, stride=stride, padding=k // 2,
                              groups=groups, bias=False)

    def __call__(self, x):
        return self.conv(nn.relu(self.bn(x)))


class DualPathBlock(nn.Module):
    """Residual + dense dual path."""

    def __init__(self, cin, num_1x1_a, num_3x3_b, num_1x1_c, inc, groups,
                 block_type="normal"):
        self.num_1x1_c = num_1x1_c
        self.inc = inc
        stride = 2 if block_type == "down" else 1
        self.has_proj = block_type in ("proj", "down")
        if self.has_proj:
            self.proj = BnActConv(cin, num_1x1_c + 2 * inc, 1, stride)
        self.a = BnActConv(cin, num_1x1_a, 1)
        self.b = BnActConv(num_1x1_a, num_3x3_b, 3, stride, groups)
        self.c = BnActConv(num_3x3_b, num_1x1_c + inc, 1)

    def __call__(self, x):
        if isinstance(x, tuple):
            res, dense = x
            inp = jnp.concatenate([res, dense], -1)
        else:
            inp = x
            res, dense = None, None
        if self.has_proj:
            p = self.proj(inp)
            res_in = p[..., :self.num_1x1_c]
            dense_in = p[..., self.num_1x1_c:]
        else:
            res_in, dense_in = res, dense
        out = self.c(self.b(self.a(inp)))
        res_out = res_in + out[..., :self.num_1x1_c]
        dense_out = jnp.concatenate([dense_in, out[..., self.num_1x1_c:]], -1)
        return res_out, dense_out


class DPN(nn.Module):
    def __init__(self, num_classes=1000, small=True, k_r=128, groups=32,
                 inc_sec=(16, 32, 32, 64), k_sec=(3, 4, 12, 3),
                 stem_ch=10):
        # small=True is the dpn68 config; small=False the large-DPN stem
        # (7x7 s2) and bandwidth table (dpn107: k_r=200 g=50)
        bw = (64, 128, 256, 512) if small else (256, 512, 1024, 2048)
        r_div = 64 if small else 256
        if small:
            self.stem = nn.Sequential(
                nn.Conv2d(3, stem_ch, 3, stride=2, padding=1, bias=False),
                nn.BatchNorm(stem_ch), nn.Activation("relu"),
                nn.MaxPool2d(3, 2, 1))
        else:
            self.stem = nn.Sequential(
                nn.Conv2d(3, stem_ch, 7, stride=2, padding=3, bias=False),
                nn.BatchNorm(stem_ch), nn.Activation("relu"),
                nn.MaxPool2d(3, 2, 1))
        blocks = []
        cin = stem_ch
        for si in range(4):
            r = k_r * bw[si] // r_div
            for bi in range(k_sec[si]):
                if bi == 0:
                    btype = "proj" if si == 0 else "down"
                else:
                    btype = "normal"
                blocks.append(DualPathBlock(cin, r, r, bw[si], inc_sec[si],
                                            groups, btype))
                # res(bw) + dense(2*inc from proj + (bi+1)*inc accumulated)
                cin = bw[si] + (bi + 3) * inc_sec[si]
        self.blocks = blocks
        self.final_bn = nn.BatchNorm(cin)
        self.pool = nn.GlobalAvgPool2d()
        self.fc = nn.Linear(cin, num_classes)

    def __call__(self, x):
        x = self.stem(x)
        out = x
        for b in self.blocks:
            out = b(out)
        out = jnp.concatenate(out, -1)
        out = nn.relu(self.final_bn(out))
        return self.fc(self.pool(out))


def dpn68(pretrained=False, **kw):
    return DPN(**kw)


def dpn107(pretrained=False, **kw):
    # reference README.md:56 dpn107 (k_R=200, G=50, 4/8/20/3 blocks)
    return DPN(small=False, k_r=200, groups=50, inc_sec=(20, 64, 64, 128),
               k_sec=(4, 8, 20, 3), stem_ch=128, **kw)


class DLABasic(nn.Module):
    def __init__(self, cin, cout, stride=1):
        self.conv1 = nn.Conv2d(cin, cout, 3, stride=stride, padding=1,
                               bias=False)
        self.bn1 = nn.BatchNorm(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm(cout)

    def __call__(self, x, residual=None):
        if residual is None:
            residual = x
        out = nn.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return nn.relu(out + residual)


class DLARoot(nn.Module):
    def __init__(self, cin, cout, residual=False):
        self.conv = nn.Conv2d(cin, cout, 1, bias=False)
        self.bn = nn.BatchNorm(cout)
        self.residual = residual

    def __call__(self, children):
        # dla34 uses non-residual roots; dla102's add the first child
        x = self.bn(self.conv(jnp.concatenate(children, -1)))
        if self.residual:
            x = x + children[0]
        return nn.relu(x)


class DLABottleneck(nn.Module):
    """1-3-1 bottleneck (expansion 2) used by the large DLA variants."""

    def __init__(self, cin, cout, stride=1):
        mid = cout // 2
        self.conv1 = nn.Conv2d(cin, mid, 1, bias=False)
        self.bn1 = nn.BatchNorm(mid)
        self.conv2 = nn.Conv2d(mid, mid, 3, stride=stride, padding=1,
                               bias=False)
        self.bn2 = nn.BatchNorm(mid)
        self.conv3 = nn.Conv2d(mid, cout, 1, bias=False)
        self.bn3 = nn.BatchNorm(cout)

    def __call__(self, x, residual=None):
        if residual is None:
            residual = x
        out = nn.relu(self.bn1(self.conv1(x)))
        out = nn.relu(self.bn2(self.conv2(out)))
        return nn.relu(self.bn3(self.conv3(out)) + residual)


class DLATree(nn.Module):
    def __init__(self, levels, cin, cout, stride=1, root_dim=0,
                 level_root=False, block=None, root_residual=False):
        block = block or DLABasic
        if root_dim == 0:
            root_dim = 2 * cout
        if level_root:
            root_dim += cin
        self.level_root = level_root
        self.levels = levels
        if levels == 1:
            self.tree1 = block(cin, cout, stride)
            self.tree2 = block(cout, cout)
            self.root = DLARoot(root_dim, cout, root_residual)
        else:
            self.tree1 = DLATree(levels - 1, cin, cout, stride,
                                 block=block, root_residual=root_residual)
            self.tree2 = DLATree(levels - 1, cout, cout,
                                 root_dim=root_dim + cout, block=block,
                                 root_residual=root_residual)
            self.root = None
        self.downsample = nn.MaxPool2d(stride, stride) if stride > 1 else None
        self.project = None
        if cin != cout:
            self.project = nn.Sequential(nn.Conv2d(cin, cout, 1, bias=False),
                                         nn.BatchNorm(cout))

    def __call__(self, x, children=None):
        children = [] if children is None else children
        bottom = self.downsample(x) if self.downsample else x
        residual = self.project(bottom) if self.project else bottom
        if self.level_root:
            children.append(bottom)
        if self.levels == 1:
            x1 = self.tree1(x, residual)
            x2 = self.tree2(x1)
            return self.root([x2, x1] + children)
        x1 = self.tree1(x)
        children.append(x1)
        return self.tree2(x1, children)


class DLA(nn.Module):
    def __init__(self, num_classes=1000,
                 levels=(1, 1, 1, 2, 2, 1),
                 channels=(16, 32, 64, 128, 256, 512),
                 block=None, root_residual=False):
        self.base = nn.Sequential(
            nn.Conv2d(3, channels[0], 7, padding=3, bias=False),
            nn.BatchNorm(channels[0]), nn.Activation("relu"))
        self.level0 = nn.Sequential(
            nn.Conv2d(channels[0], channels[0], 3, padding=1, bias=False),
            nn.BatchNorm(channels[0]), nn.Activation("relu"))
        self.level1 = nn.Sequential(
            nn.Conv2d(channels[0], channels[1], 3, stride=2, padding=1,
                      bias=False),
            nn.BatchNorm(channels[1]), nn.Activation("relu"))
        kw = dict(block=block, root_residual=root_residual)
        self.level2 = DLATree(levels[2], channels[1], channels[2], 2, **kw)
        self.level3 = DLATree(levels[3], channels[2], channels[3], 2,
                              level_root=True, **kw)
        self.level4 = DLATree(levels[4], channels[3], channels[4], 2,
                              level_root=True, **kw)
        self.level5 = DLATree(levels[5], channels[4], channels[5], 2,
                              level_root=True, **kw)
        self.pool = nn.GlobalAvgPool2d()
        self.fc = nn.Linear(channels[5], num_classes)

    def __call__(self, x):
        x = self.level1(self.level0(self.base(x)))
        x = self.level5(self.level4(self.level3(self.level2(x))))
        return self.fc(self.pool(x))


def dla34(pretrained=False, **kw):
    return DLA(**kw)


def dla102(pretrained=False, **kw):
    # reference README.md:55 dla102: bottleneck blocks + residual roots
    return DLA(levels=(1, 1, 1, 3, 4, 1),
               channels=(16, 32, 128, 256, 512, 1024),
               block=DLABottleneck, root_residual=True, **kw)
