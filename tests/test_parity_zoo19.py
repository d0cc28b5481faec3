"""Zoo parity wave 19: TrOCR torch oracle — ViT encoder + BART-style
causal decoder with cross attention and the +2 position offset
(reference tlxcv/models/ocr/{trocr.py, vit.py, trocr_decoder.py});
teacher-forcing logits matched end-to-end through the converter.
"""
import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

from tests.test_parity_zoo6 import TMHA, TMlp, TPatchEmbed, TViTBlock
from tlxcv_tpu.core import pure, split
from tlxcv_tpu.utils.convert import convert_by_order

torch.manual_seed(18)


class TViTEncoder(tnn.Module):
    def __init__(self, img=32, patch=16, dim=32, depth=1, heads=2):
        super().__init__()
        n = (img // patch) ** 2
        self.patch_embed = TPatchEmbed(dim, patch)
        self.cls_token = tnn.Parameter(torch.randn(1, 1, dim) * 0.02)
        self.pos_embed = tnn.Parameter(torch.randn(1, n + 1, dim) * 0.02)
        self.blocks = tnn.ModuleList(TViTBlock(dim, heads)
                                     for _ in range(depth))
        self.norm = tnn.LayerNorm(dim)  # eps 1e-5, framework default

    def forward(self, x):
        b = x.shape[0]
        x = self.patch_embed(x)
        x = torch.cat([self.cls_token.expand(b, -1, -1), x], 1)
        x = x + self.pos_embed
        for blk in self.blocks:
            x = blk(x)
        return self.norm(x)


class TCrossAttention(tnn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.heads, self.hd = heads, dim // heads
        self.q = tnn.Linear(dim, dim)
        self.k = tnn.Linear(dim, dim)
        self.v = tnn.Linear(dim, dim)
        self.out = tnn.Linear(dim, dim)

    def _split(self, x):
        b, n, _ = x.shape
        return x.reshape(b, n, self.heads, self.hd).permute(0, 2, 1, 3)

    def forward(self, x, memory):
        q = self._split(self.q(x))
        k = self._split(self.k(memory))
        v = self._split(self.v(memory))
        attn = ((q * self.hd ** -0.5) @ k.transpose(-2, -1)).softmax(-1)
        o = attn @ v
        b, h, n, d = o.shape
        return self.out(o.permute(0, 2, 1, 3).reshape(b, n, h * d))


class TSelfAttn(tnn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.heads, self.hd = heads, dim // heads
        self.q = tnn.Linear(dim, dim)
        self.k = tnn.Linear(dim, dim)
        self.v = tnn.Linear(dim, dim)
        self.out = tnn.Linear(dim, dim)

    def _split(self, x):
        b, n, _ = x.shape
        return x.reshape(b, n, self.heads, self.hd).permute(0, 2, 1, 3)

    def forward(self, x):
        n = x.shape[1]
        q, k, v = self._split(self.q(x)), self._split(self.k(x)), \
            self._split(self.v(x))
        attn = (q * self.hd ** -0.5) @ k.transpose(-2, -1)
        attn = attn + torch.triu(torch.full((n, n), -1e9), diagonal=1)
        o = attn.softmax(-1) @ v
        b, h, n, d = o.shape
        return self.out(o.permute(0, 2, 1, 3).reshape(b, n, h * d))


class TDecoderLayer(tnn.Module):
    def __init__(self, dim, heads, ffn):
        super().__init__()
        self.self_attn = TSelfAttn(dim, heads)
        self.norm1 = tnn.LayerNorm(dim)
        self.cross_attn = TCrossAttention(dim, heads)
        self.norm2 = tnn.LayerNorm(dim)
        self.fc1 = tnn.Linear(dim, ffn)
        self.fc2 = tnn.Linear(ffn, dim)
        self.norm3 = tnn.LayerNorm(dim)

    def forward(self, x, memory):
        x = self.norm1(x + self.self_attn(x))
        x = self.norm2(x + self.cross_attn(x, memory))
        return self.norm3(x + self.fc2(F.gelu(self.fc1(x))))


class TTrOCR(tnn.Module):
    def __init__(self, vocab=50, enc_dim=32, dec_dim=16, depth=1, heads=2,
                 max_positions=8):
        super().__init__()
        import math

        self.encoder = TViTEncoder(dim=enc_dim)
        self.enc_to_dec = tnn.Linear(enc_dim, dec_dim)
        self.embed_tokens = tnn.Embedding(vocab, dec_dim)
        self.embed_positions = tnn.Embedding(max_positions + 2, dec_dim)
        self.embed_scale = math.sqrt(dec_dim)
        self.layernorm_embedding = tnn.LayerNorm(dec_dim)
        self.layers = tnn.ModuleList(
            TDecoderLayer(dec_dim, heads, dec_dim * 4)
            for _ in range(depth))
        self.output_projection = tnn.Linear(dec_dim, vocab, bias=False)

    def forward(self, images, input_ids):
        memory = self.enc_to_dec(self.encoder(images))
        n = input_ids.shape[1]
        pos = torch.arange(n)[None, :]
        x = self.embed_tokens(input_ids) * self.embed_scale
        x = x + self.embed_positions(pos + 2)
        x = self.layernorm_embedding(x)
        for layer in self.layers:
            x = layer(x, memory)
        return self.output_projection(x)


def test_trocr_parity(rng):
    from tlxcv_tpu.models.ocr.trocr import TrOCR

    tm = TTrOCR().eval()
    model = TrOCR(vocab_size=50, encoder_dim=32, encoder_depth=1,
                  encoder_heads=2, decoder_dim=16, decoder_depth=1,
                  decoder_heads=2, img_size=32, patch_size=16,
                  max_length=8)
    unmatched = convert_by_order(
        {k: v.detach().numpy() for k, v in tm.state_dict().items()},
        model, source="torch")
    assert not unmatched, unmatched
    x = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    ids = rng.integers(0, 50, size=(2, 6)).astype(np.int64)
    with torch.no_grad():
        ref = tm(torch.tensor(x), torch.tensor(ids)).numpy()
    import jax.numpy as jnp

    params, state = split(model)
    out, _ = pure(model)(params, state,
                         jnp.asarray(x.transpose(0, 2, 3, 1)),
                         jnp.asarray(ids.astype(np.int32)))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-3, rtol=1e-3)

    # the jitted KV-cache step path must agree with the full forward
    memory = model.encode(jnp.asarray(x.transpose(0, 2, 3, 1)))
    cache = model.decoder.init_cache(2, 8)
    logits_steps = []
    for t in range(6):
        lg, cache = model.decoder.decode_step(
            jnp.asarray(ids[:, t].astype(np.int32)), jnp.asarray(t),
            memory, cache)
        logits_steps.append(np.asarray(lg))
    np.testing.assert_allclose(np.stack(logits_steps, 1), ref, atol=1e-3,
                               rtol=1e-3)
