"""TrOCR (reference tlxcv/models/ocr/{trocr.py, vit.py, trocr_decoder.py}):
ViT encoder (vit.py:25-481 HF-style) + causal transformer decoder
(trocr_decoder.py:13-530) with teacher-forcing loss (trocr.py:145-164).

TPU-first change (SURVEY.md §3.5): greedy generation is a single jitted
`lax.scan` with a KV cache — the reference re-runs the full decoder per
token from a host python loop with no cache (trocr.py:166-185).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ... import nn
from ...core import init as I
from ...core.module import Module, Param
from ...nn.attention import scaled_dot_product_attention

__all__ = ["TrOCR", "ViTEncoder", "TrOCRDecoder"]

NEG = -1e9


class ViTEncoder(Module):
    """Image encoder (HF ViTModel shape: cls token + patches, pre-LN)."""

    def __init__(self, img_size=384, patch_size=16, embed_dim=384, depth=6,
                 num_heads=6, mlp_ratio=4.0):
        from ..classification.vision_transformer import Block, PatchEmbed

        self.patch_embed = PatchEmbed(img_size, patch_size, 3, embed_dim)
        n = self.patch_embed.num_patches
        self.cls_token = Param(I.truncated_normal((1, 1, embed_dim), std=0.02))
        self.pos_embed = Param(I.truncated_normal((1, n + 1, embed_dim), std=0.02))
        self.blocks = [Block(embed_dim, num_heads, mlp_ratio, qkv_bias=True)
                       for _ in range(depth)]
        self.norm = nn.LayerNorm(embed_dim)
        self.embed_dim = embed_dim

    def __call__(self, x):
        b = x.shape[0]
        x = self.patch_embed(x)
        cls = jnp.broadcast_to(self.cls_token.value.astype(x.dtype),
                               (b, 1, x.shape[-1]))
        x = jnp.concatenate([cls, x], 1) + self.pos_embed.value.astype(x.dtype)
        for blk in self.blocks:
            x = blk(x)
        return self.norm(x)


class CrossAttention(Module):
    def __init__(self, dim, num_heads):
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.q = nn.Linear(dim, dim)
        self.k = nn.Linear(dim, dim)
        self.v = nn.Linear(dim, dim)
        self.out = nn.Linear(dim, dim)

    def _split(self, x):
        b, n, _ = x.shape
        return x.reshape(b, n, self.num_heads, self.head_dim).transpose(0, 2, 1, 3)

    def kv(self, memory):
        """Precompute the loop-invariant K/V projections (hoisted out of
        the decode scan: XLA does not LICM expensive dots, so computing
        them per step cost depth*2 redundant [*, 577, D] matmuls per
        generated token)."""
        return self._split(self.k(memory)), self._split(self.v(memory))

    def with_kv(self, x, kk, vv, mask=None):
        o = scaled_dot_product_attention(self._split(self.q(x)), kk, vv,
                                         mask=mask)
        b, h, n, d = o.shape
        return self.out(o.transpose(0, 2, 1, 3).reshape(b, n, h * d))

    def __call__(self, x, memory, mask=None):
        kk, vv = self.kv(memory)
        return self.with_kv(x, kk, vv, mask=mask)


class SelfAttentionKV(Module):
    """Causal self-attention that can also run one-step with a KV cache."""

    def __init__(self, dim, num_heads):
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.q = nn.Linear(dim, dim)
        self.k = nn.Linear(dim, dim)
        self.v = nn.Linear(dim, dim)
        self.out = nn.Linear(dim, dim)

    def _split(self, x):
        b, n, _ = x.shape
        return x.reshape(b, n, self.num_heads, self.head_dim).transpose(0, 2, 1, 3)

    def full(self, x):
        n = x.shape[1]
        causal = jnp.triu(jnp.full((n, n), NEG, x.dtype), k=1)
        o = scaled_dot_product_attention(
            self._split(self.q(x)), self._split(self.k(x)),
            self._split(self.v(x)), mask=causal)
        b, h, n, d = o.shape
        return self.out(o.transpose(0, 2, 1, 3).reshape(b, n, h * d))

    def step(self, x_t, cache_k, cache_v, pos):
        """x_t [B, 1, D]; cache [B, H, T, d]; pos scalar index."""
        q = self._split(self.q(x_t))            # [B, H, 1, d]
        k_t = self._split(self.k(x_t))
        v_t = self._split(self.v(x_t))
        cache_k = jax.lax.dynamic_update_slice(cache_k, k_t, (0, 0, pos, 0))
        cache_v = jax.lax.dynamic_update_slice(cache_v, v_t, (0, 0, pos, 0))
        t = cache_k.shape[2]
        mask = jnp.where(jnp.arange(t)[None, None, None, :] <= pos, 0.0, NEG)
        o = scaled_dot_product_attention(q, cache_k, cache_v, mask=mask)
        b, h, n, d = o.shape
        return self.out(o.transpose(0, 2, 1, 3).reshape(b, 1, h * d)), cache_k, cache_v


class DecoderLayer(Module):
    def __init__(self, dim, num_heads, ffn_dim):
        self.self_attn = SelfAttentionKV(dim, num_heads)
        self.norm1 = nn.LayerNorm(dim)
        self.cross_attn = CrossAttention(dim, num_heads)
        self.norm2 = nn.LayerNorm(dim)
        self.fc1 = nn.Linear(dim, ffn_dim)
        self.fc2 = nn.Linear(ffn_dim, dim)
        self.norm3 = nn.LayerNorm(dim)

    def full(self, x, memory):
        x = self.norm1(x + self.self_attn.full(x))
        x = self.norm2(x + self.cross_attn(x, memory))
        return self.norm3(x + self.fc2(nn.gelu(self.fc1(x))))

    def step(self, x_t, mem_kv, ck, cv, pos):
        y, ck, cv = self.self_attn.step(x_t, ck, cv, pos)
        x_t = self.norm1(x_t + y)
        x_t = self.norm2(x_t + self.cross_attn.with_kv(x_t, *mem_kv))
        return self.norm3(x_t + self.fc2(nn.gelu(self.fc1(x_t)))), ck, cv


class TrOCRDecoder(Module):
    """Causal LM decoder with learned positions (BART-style +2 offset,
    reference trocr_decoder.py:60)."""

    def __init__(self, vocab_size=64044, dim=256, depth=6, num_heads=8,
                 ffn_dim=1024, max_positions=128, pad_token_id=1):
        self.embed_tokens = nn.Embedding(vocab_size, dim)
        self.embed_positions = nn.Embedding(max_positions + 2, dim)
        self.embed_scale = math.sqrt(dim)
        self.layernorm_embedding = nn.LayerNorm(dim)
        self.layers = [DecoderLayer(dim, num_heads, ffn_dim)
                       for _ in range(depth)]
        self.output_projection = nn.Linear(dim, vocab_size, bias=False)
        self.dim = dim
        self.num_heads = num_heads
        self.max_positions = max_positions
        self.vocab_size = vocab_size

    def _embed(self, ids, positions):
        x = self.embed_tokens(ids) * self.embed_scale
        x = x + self.embed_positions(positions + 2)
        return self.layernorm_embedding(x)

    def __call__(self, input_ids, memory):
        n = input_ids.shape[1]
        if n > self.max_positions:
            raise ValueError(
                f"sequence length {n} exceeds max_positions "
                f"{self.max_positions} (the position table would be "
                f"silently clipped)")
        x = self._embed(input_ids, jnp.arange(n)[None, :])
        for layer in self.layers:
            x = layer.full(x, memory)
        return self.output_projection(x)

    def init_cache(self, batch, max_len, dtype=jnp.float32):
        hd = self.dim // self.num_heads
        shape = (batch, self.num_heads, max_len, hd)
        return [(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))
                for _ in self.layers]

    def memory_kv(self, memory):
        """Per-layer cross-attention K/V of the encoder memory —
        precompute ONCE before a decode scan (loop-invariant)."""
        return [layer.cross_attn.kv(memory) for layer in self.layers]

    def decode_step(self, token, pos, memory, cache, mem_kvs=None):
        x = self._embed(token[:, None], pos[None, None])
        if mem_kvs is None:
            mem_kvs = self.memory_kv(memory)
        new_cache = []
        for layer, (ck, cv), kv in zip(self.layers, cache, mem_kvs):
            x, ck, cv = layer.step(x, kv, ck, cv, pos)
            new_cache.append((ck, cv))
        return self.output_projection(x)[:, 0], new_cache


class TrOCR(Module):
    def __init__(self, vocab_size=64044, encoder_dim=384, encoder_depth=6,
                 encoder_heads=6, decoder_dim=256, decoder_depth=6,
                 decoder_heads=8, img_size=384, patch_size=16,
                 max_length=128, bos_token_id=0, pad_token_id=1,
                 eos_token_id=2):
        self.encoder = ViTEncoder(img_size, patch_size, encoder_dim,
                                  encoder_depth, encoder_heads)
        self.enc_to_dec = (nn.Linear(encoder_dim, decoder_dim)
                           if encoder_dim != decoder_dim else nn.Identity())
        self.decoder = TrOCRDecoder(vocab_size, decoder_dim, decoder_depth,
                                    decoder_heads, decoder_dim * 4, max_length)
        self.max_length = max_length
        self.bos_token_id = bos_token_id
        self.pad_token_id = pad_token_id
        self.eos_token_id = eos_token_id

    def encode(self, images):
        return self.enc_to_dec(self.encoder(images))

    def __call__(self, images, input_ids=None):
        memory = self.encode(images)
        if input_ids is None:
            return self.generate(images, memory=memory)
        return self.decoder(input_ids, memory)

    def loss_fn(self, images, labels):
        """Teacher forcing: input = [BOS, y..]; target = [y.., EOS]
        with pad masking (reference trocr.py:145-164)."""
        memory = self.encode(images)
        b, n = labels.shape
        bos = jnp.full((b, 1), self.bos_token_id, labels.dtype)
        inputs = jnp.concatenate([bos, labels[:, :-1]], 1)
        logits = self.decoder(inputs, memory)
        mask = (labels != self.pad_token_id).astype(jnp.float32)
        logp = jax.nn.log_softmax(logits, -1)
        nll = -jnp.take_along_axis(logp, labels[..., None], -1)[..., 0]
        return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)

    def generate(self, images=None, memory=None):
        """Greedy decode, one jitted lax.scan with KV cache."""
        if memory is None:
            memory = self.encode(images)
        b = memory.shape[0]
        cache = self.decoder.init_cache(b, self.max_length, memory.dtype)
        mem_kvs = self.decoder.memory_kv(memory)   # hoisted out of the scan

        def step(carry, pos):
            token, cache, done = carry
            logits, cache = self.decoder.decode_step(token, pos, memory,
                                                     cache, mem_kvs)
            next_token = jnp.argmax(logits, -1).astype(jnp.int32)
            next_token = jnp.where(done, self.pad_token_id, next_token)
            done = done | (next_token == self.eos_token_id)
            return (next_token, cache, done), next_token

        init = (jnp.full((b,), self.bos_token_id, jnp.int32), cache,
                jnp.zeros((b,), bool))
        _, tokens = jax.lax.scan(step, init, jnp.arange(self.max_length))
        return jnp.transpose(tokens)  # [B, T]

    def generate_beam(self, images=None, memory=None, num_beams=4,
                      length_penalty=1.0):
        """Beam search, fully on-device: one lax.scan over positions with
        a KV cache replicated per beam and reordered by gather at every
        step (the reference's generate is a host-driven greedy while-loop
        with no cache at all — trocr.py:166-185).

        Returns [B, T] tokens of the best finished beam (by
        sum-logprob / length**length_penalty).
        """
        if memory is None:
            memory = self.encode(images)
        b = memory.shape[0]
        k = num_beams
        # beam bookkeeping stays f32: bf16 cumulative logprobs lose
        # beam-ordering resolution after ~20 tokens
        neg = jnp.float32(-1e9)
        mem = jnp.repeat(memory, k, axis=0)            # [B*K, M, D]
        mem_kvs = self.decoder.memory_kv(mem)          # hoisted
        cache = self.decoder.init_cache(b * k, self.max_length, memory.dtype)
        vocab = self.decoder.output_projection.weight.value.shape[-1]

        # only beam 0 live at the start (all beams share BOS)
        scores0 = jnp.tile(
            jnp.concatenate([jnp.zeros((1,)), jnp.full((k - 1,), -1e9)]),
            (b, 1)).astype(jnp.float32)

        def step(carry, pos):
            last, buf, scores, done, lengths, cache = carry
            logits, cache = self.decoder.decode_step(
                last.reshape(b * k), pos, mem, cache, mem_kvs)
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
            logp = logp.reshape(b, k, vocab)
            # finished beams may only emit PAD at zero cost
            pad_only = jnp.full((vocab,), neg).at[self.pad_token_id].set(0.0)
            logp = jnp.where(done[..., None], pad_only[None, None], logp)
            cand = (scores[..., None] + logp).reshape(b, k * vocab)
            scores, idx = jax.lax.top_k(cand, k)       # [B, K]
            beam_idx = idx // vocab
            tok = (idx % vocab).astype(jnp.int32)

            gather = lambda x: jnp.take_along_axis(
                x, beam_idx.reshape(beam_idx.shape + (1,) * (x.ndim - 2)),
                axis=1)
            buf = gather(buf)
            done_prev = jnp.take_along_axis(done, beam_idx, 1)
            lengths = jnp.take_along_axis(lengths, beam_idx, 1)
            lengths = lengths + (~done_prev).astype(lengths.dtype)
            done = done_prev | (tok == self.eos_token_id)
            buf = jax.lax.dynamic_update_slice(
                buf, tok[..., None], (0, 0, pos))
            flat = (jnp.arange(b)[:, None] * k + beam_idx).reshape(-1)
            cache = jax.tree_util.tree_map(lambda c: c[flat], cache)
            return (tok, buf, scores, done, lengths, cache), None

        init = (jnp.full((b, k), self.bos_token_id, jnp.int32),
                jnp.full((b, k, self.max_length), self.pad_token_id,
                         jnp.int32),
                scores0, jnp.zeros((b, k), bool),
                jnp.zeros((b, k), jnp.float32), cache)
        (last, buf, scores, done, lengths, _), _ = jax.lax.scan(
            step, init, jnp.arange(self.max_length))
        final = scores.astype(jnp.float32) / jnp.maximum(
            lengths, 1.0) ** length_penalty
        best = jnp.argmax(final, axis=1)
        return buf[jnp.arange(b), best]
