"""TrOCR: teacher-forcing loss, cached greedy decode == full decode, CER."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tlxcv_tpu.core import pure, split
from tlxcv_tpu.models.ocr import CharTokenizer, TrOCR
from tlxcv_tpu.tasks.ocr import character_error_rate, edit_distance


@pytest.fixture(scope="module")
def tiny_trocr():
    return TrOCR(vocab_size=40, encoder_dim=32, encoder_depth=1,
                 encoder_heads=2, decoder_dim=32, decoder_depth=2,
                 decoder_heads=2, img_size=32, patch_size=8, max_length=8)


def test_trocr_loss_and_grads(tiny_trocr, rng):
    model = tiny_trocr
    params, state = split(model)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32)
    labels = jnp.asarray(rng.integers(3, 40, size=(2, 8)), jnp.int32)

    lp = pure(model, lambda m, x, y: m.loss_fn(x, y))
    loss, _ = jax.jit(lambda p, s: lp(p, s, x, labels))(params, state)
    assert np.isfinite(float(loss)) and float(loss) > 0
    g = jax.grad(lambda p: lp(p, state, x, labels)[0])(params)
    assert float(jnp.abs(g["decoder/embed_tokens/weight"]).sum()) > 0


def test_cached_decode_matches_full_decoder(tiny_trocr, rng):
    """The KV-cache scan must produce the same greedy tokens as running
    the full decoder per step (the reference's O(n^2) strategy)."""
    model = tiny_trocr
    params, state = split(model)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32)

    gen = pure(model, lambda m, x: m.generate(x))
    tokens_cached, _ = jax.jit(lambda p, s, x: gen(p, s, x))(params, state, x)
    tokens_cached = np.asarray(tokens_cached)

    # naive per-step full decode
    def naive(m, x):
        memory = m.encode(x)
        b = x.shape[0]
        ids = jnp.full((b, 1), m.bos_token_id, jnp.int32)
        done = np.zeros((b,), bool)
        outs = []
        for _ in range(m.max_length):
            logits = m.decoder(ids, memory)
            nxt = np.asarray(jnp.argmax(logits[:, -1], -1)).astype(np.int32)
            nxt = np.where(done, m.pad_token_id, nxt)
            done = done | (nxt == m.eos_token_id)
            outs.append(nxt)
            ids = jnp.concatenate([ids, jnp.asarray(nxt)[:, None]], 1)
        return np.stack(outs, 1)

    naive_fn = pure(model, naive)
    tokens_naive, _ = naive_fn(params, state, x)
    np.testing.assert_array_equal(tokens_cached, tokens_naive)


def test_char_tokenizer_roundtrip():
    tok = CharTokenizer()
    ids = tok.encode("hello42")
    assert tok.decode(ids) == "hello42"


def test_cer():
    assert edit_distance("kitten", "sitting") == 3
    assert character_error_rate(["abc"], ["abc"]) == 0.0
    assert character_error_rate(["abd"], ["abc"]) == pytest.approx(1 / 3)


def test_trocr_beam_search(rng):
    """Beam search (jitted, KV-cache, per-step beam reorder): width 1
    reproduces greedy exactly; exhaustive width equals the brute-force
    global optimum."""
    import itertools

    import jax
    import jax.numpy as jnp

    from tlxcv_tpu.core import pure, split
    from tlxcv_tpu.models.ocr.trocr import TrOCR

    V, T = 6, 3
    m = TrOCR(vocab_size=V, encoder_dim=16, encoder_depth=1,
              encoder_heads=2, decoder_dim=16, decoder_depth=1,
              decoder_heads=2, img_size=32, patch_size=16, max_length=T)
    params, state = split(m)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32)

    greedy, _ = pure(m, lambda mm, v: mm.generate(v))(params, state, x)
    beam1, _ = pure(m, lambda mm, v: mm.generate_beam(v, num_beams=1))(
        params, state, x)
    np.testing.assert_array_equal(np.asarray(greedy), np.asarray(beam1))

    def seq_logprob_batch(toks_np, img):
        def f(mm, v, toks):
            mem = jnp.repeat(mm.encode(v), toks.shape[0], 0)
            b, n = toks.shape
            bos = jnp.full((b, 1), mm.bos_token_id, toks.dtype)
            logits = mm.decoder(jnp.concatenate([bos, toks[:, :-1]], 1), mem)
            lp = jax.nn.log_softmax(logits, -1)
            tok_lp = jnp.take_along_axis(lp, toks[..., None], -1)[..., 0]
            em = jnp.cumsum((toks == mm.eos_token_id).astype(jnp.int32), 1)
            alive = (em - (toks == mm.eos_token_id).astype(jnp.int32)) == 0
            return (tok_lp * alive).sum(1)
        out, _ = pure(m, f)(params, state, img, jnp.asarray(toks_np))
        return np.asarray(out)

    cands = []
    for seq in itertools.product(range(V), repeat=T):
        seen = False
        ok = True
        for t in seq:
            if seen and t != m.pad_token_id:
                ok = False
                break
            seen = seen or t == m.eos_token_id
        if ok:
            cands.append(seq)
    cands = np.asarray(cands, np.int32)
    img0 = x[:1]
    scores = seq_logprob_batch(cands, img0)
    beam, _ = pure(m, lambda mm, v: mm.generate_beam(
        v, num_beams=len(cands), length_penalty=0.0))(params, state, img0)
    got = seq_logprob_batch(np.asarray(beam), img0)[0]
    assert got == pytest.approx(float(scores.max()), abs=1e-4)


def test_trocr_overfit_to_cer(tiny_trocr, rng):
    """OCR learn-to-metric loop: overfit two (image, text) pairs with
    teacher forcing; greedy generate decodes back to the exact strings
    (CER = 0 through the CharTokenizer)."""
    import optax

    from tlxcv_tpu.core import Rngs

    m = tiny_trocr
    tok = CharTokenizer("abcdefgh ")
    texts = ["abc ha", "hedge"]
    ids = np.full((2, 8), m.pad_token_id, np.int32)
    for i, t in enumerate(texts):
        enc = tok.encode(t)[: 7]
        ids[i, :len(enc)] = enc
        ids[i, len(enc)] = m.eos_token_id

    params, state = split(m)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32)
    labels = jnp.asarray(ids)

    lp = pure(m, lambda mm, v, t: mm.loss_fn(v, t))
    tx = optax.adam(2e-3)
    ost = tx.init(params)

    @jax.jit
    def step(p, s, o):
        def lf(pp):
            loss, ns = lp(pp, s, x, labels, training=True,
                          rngs=Rngs(jax.random.key(0)))
            return loss, ns

        (l, s2), g = jax.value_and_grad(lf, has_aux=True)(p)
        u, o = tx.update(g, o)
        return optax.apply_updates(p, u), s2, o, l

    for _ in range(200):
        params, state, ost, loss = step(params, state, ost)

    tokens, _ = pure(m, lambda mm, v: mm.generate(v))(params, state, x)
    tokens = np.asarray(tokens)
    preds = []
    for row in tokens:
        chars = []
        for t in row:
            if t == m.eos_token_id or t == m.pad_token_id:
                break
            chars.append(int(t))
        preds.append(tok.decode(chars))
    cer = character_error_rate(preds, texts)
    assert cer == pytest.approx(0.0, abs=1e-9), (preds, texts, cer)
