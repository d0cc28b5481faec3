"""DETR torch-oracle parity (golden battery -> 20 archs): frozen-BN
ResNet-50 backbone, sine position embeddings, 2+2 transformer, class +
box-MLP heads — forward logits/boxes match through the converter."""
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

from tests.test_parity_zoo import _randomize_bn, _x
from tests.test_parity_zoo2 import TRes50Feats
from tlxcv_tpu.core import pure, split
from tlxcv_tpu.utils.convert import convert_by_order

torch.manual_seed(4)

DIM, HEADS, FFN, NQ, NC = 32, 4, 64, 8, 5


class TDetrAttention(tnn.Module):
    def __init__(self, dim=DIM, heads=HEADS):
        super().__init__()
        self.heads = heads
        self.hd = dim // heads
        self.q = tnn.Linear(dim, dim)
        self.k = tnn.Linear(dim, dim)
        self.v = tnn.Linear(dim, dim)
        self.out = tnn.Linear(dim, dim)

    def _split(self, x):
        b, n, c = x.shape
        return x.view(b, n, self.heads, self.hd).transpose(1, 2)

    def forward(self, q, k, v, q_pos=None, k_pos=None):
        qq = self._split(self.q(q if q_pos is None else q + q_pos))
        kk = self._split(self.k(k if k_pos is None else k + k_pos))
        vv = self._split(self.v(v))
        attn = ((qq @ kk.transpose(-2, -1)) * self.hd ** -0.5).softmax(-1)
        o = (attn @ vv).transpose(1, 2).reshape(q.shape)
        return self.out(o)


class TEncoderLayer(tnn.Module):
    def __init__(self):
        super().__init__()
        self.attn = TDetrAttention()
        self.norm1 = tnn.LayerNorm(DIM)
        self.fc1 = tnn.Linear(DIM, FFN)
        self.fc2 = tnn.Linear(FFN, DIM)
        self.norm2 = tnn.LayerNorm(DIM)

    def forward(self, x, pos):
        x = self.norm1(x + self.attn(x, x, x, pos, pos))
        return self.norm2(x + self.fc2(torch.relu(self.fc1(x))))


class TDecoderLayer(tnn.Module):
    def __init__(self):
        super().__init__()
        self.self_attn = TDetrAttention()
        self.norm1 = tnn.LayerNorm(DIM)
        self.cross_attn = TDetrAttention()
        self.norm2 = tnn.LayerNorm(DIM)
        self.fc1 = tnn.Linear(DIM, FFN)
        self.fc2 = tnn.Linear(FFN, DIM)
        self.norm3 = tnn.LayerNorm(DIM)

    def forward(self, q, memory, q_pos, mem_pos):
        q = self.norm1(q + self.self_attn(q, q, q, q_pos, q_pos))
        q = self.norm2(q + self.cross_attn(q, memory, memory, q_pos,
                                           mem_pos))
        return self.norm3(q + self.fc2(torch.relu(self.fc1(q))))


class TMLP(tnn.Module):
    def __init__(self, in_dim, hidden, out_dim):
        super().__init__()
        self.layers = tnn.ModuleList([tnn.Linear(in_dim, hidden),
                                      tnn.Linear(hidden, hidden),
                                      tnn.Linear(hidden, out_dim)])

    def forward(self, x):
        for i, l in enumerate(self.layers):
            x = l(x) if i == len(self.layers) - 1 else torch.relu(l(x))
        return x


class TDetr(tnn.Module):
    def __init__(self):
        super().__init__()
        self.backbone = TRes50Feats()
        self.input_proj = tnn.Conv2d(2048, DIM, 1)
        self.query_embed = tnn.Parameter(torch.randn(NQ, DIM))
        self.encoder = tnn.ModuleList(TEncoderLayer() for _ in range(2))
        self.decoder = tnn.ModuleList(TDecoderLayer() for _ in range(2))
        self.dec_norm = tnn.LayerNorm(DIM)
        self.class_head = tnn.Linear(DIM, NC + 1)
        self.bbox_head = TMLP(DIM, DIM, 4)

    def forward(self, x):
        feats = self.backbone(x)[-1]          # C5 NCHW
        x = self.input_proj(feats)
        b, c, h, w = x.shape
        from tlxcv_tpu.models.detection.detr import sine_position_embedding

        pos = torch.tensor(sine_position_embedding(h, w, DIM).reshape(
            1, h * w, DIM))
        src = x.flatten(2).transpose(1, 2)    # [B, HW, C]
        for layer in self.encoder:
            src = layer(src, pos)
        q_pos = self.query_embed.unsqueeze(0).expand(b, -1, -1)
        q = torch.zeros_like(q_pos)
        for layer in self.decoder:
            q = layer(q, src, q_pos, pos)
        feat = self.dec_norm(q)
        return self.class_head(feat), torch.sigmoid(self.bbox_head(feat))


def test_detr_parity(rng):
    from tlxcv_tpu.models.detection.detr import Detr

    model = Detr(num_classes=NC, num_queries=NQ, dim=DIM, heads=HEADS,
                 enc_layers=2, dec_layers=2, ffn=FFN, dropout=0.0)
    tmodel = TDetr().eval()
    _randomize_bn(tmodel)  # frozen-BN buffers get nontrivial values
    unmatched = convert_by_order(
        {k: v.detach().numpy() for k, v in tmodel.state_dict().items()},
        model, source="torch")
    assert not unmatched

    x = _x(rng, 64)
    with torch.no_grad():
        ref_logits, ref_boxes = tmodel(torch.tensor(x))
    params, state = split(model)
    out, _ = pure(model)(params, state,
                         jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.asarray(out["logits"]), ref_logits.numpy(),
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out["boxes"]), ref_boxes.numpy(),
                               atol=1e-4, rtol=1e-3)
