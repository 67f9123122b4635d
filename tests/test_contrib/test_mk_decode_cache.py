"""KV-cache incremental decoding must be exactly one-shot causal
attention, position by position — stepwise, chunk-prefilled, and as a
single jitted ``lax.scan`` generation loop."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import padertorch_tpu as pt
from padertorch_tpu import random as ptrandom
from padertorch_tpu.contrib.mk.modules.transformer import (
    MultiheadAttention, TransformerDecoder)


def _x(shape, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=shape).astype('float32'))


@pytest.mark.parametrize('use_rope', [False, True])
def test_mha_decode_step_equals_causal_forward(use_rope):
    ptrandom.seed(0)
    mha = MultiheadAttention(16, 4, use_rope=use_rope).eval()
    x = _x((2, 12, 16), seed=1)
    want = mha(x, causal=True)

    cache = mha.init_cache(batch_size=2, max_len=12)
    outs = []
    for t in range(12):
        out, cache = mha.decode_step(x[:, t:t + 1], cache, t)
        outs.append(out)
    got = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_mha_decode_prefill_chunks():
    # Tq > 1 prefill: two 4-token chunks then stepwise, all causal
    ptrandom.seed(1)
    mha = MultiheadAttention(16, 4, use_rope=True).eval()
    x = _x((2, 10, 16), seed=2)
    want = mha(x, causal=True)

    cache = mha.init_cache(batch_size=2, max_len=10)
    o1, cache = mha.decode_step(x[:, 0:4], cache, 0)
    o2, cache = mha.decode_step(x[:, 4:8], cache, 4)
    o3, cache = mha.decode_step(x[:, 8:9], cache, 8)
    o4, cache = mha.decode_step(x[:, 9:10], cache, 9)
    got = jnp.concatenate([o1, o2, o3, o4], axis=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_mha_cache_larger_than_sequence():
    # unwritten cache slots beyond the decoded prefix must not leak in
    ptrandom.seed(2)
    mha = MultiheadAttention(16, 4).eval()
    x = _x((1, 6, 16), seed=3)
    want = mha(x, causal=True)
    cache = mha.init_cache(batch_size=1, max_len=32)
    outs = []
    for t in range(6):
        out, cache = mha.decode_step(x[:, t:t + 1], cache, t)
        outs.append(out)
    np.testing.assert_allclose(
        np.asarray(jnp.concatenate(outs, 1)), np.asarray(want),
        rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize('pre_norm', [True, False])
def test_decoder_decode_equals_forward(pre_norm):
    ptrandom.seed(3)
    dec = TransformerDecoder(
        d_model=16, num_layers=2, num_heads=4, pre_norm=pre_norm,
        d_memory=8).eval()
    x = _x((2, 9, 16), seed=4)
    memory = _x((2, 7, 8), seed=5)
    lens = [5, 7]
    want = dec(x, memory, memory_seq_len=lens)

    cache = dec.init_cache(memory, max_len=9)
    outs = []
    for t in range(9):
        out, cache = dec.decode_step(
            x[:, t:t + 1], cache, t, memory_seq_len=lens)
        outs.append(out)
    got = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_decoder_scan_generation_jits_once():
    # the whole generation loop as ONE lax.scan over a traced index:
    # feed each step's output back as the next step's input
    ptrandom.seed(4)
    dec = TransformerDecoder(
        d_model=16, num_layers=2, num_heads=4, use_rope=True).eval()
    memory = _x((2, 5, 16), seed=6)
    x0 = _x((2, 1, 16), seed=7)
    steps = 8

    @jax.jit
    def generate(x0, memory):
        cache = dec.init_cache(memory, max_len=steps)

        def step(carry, t):
            x, cache = carry
            out, cache = dec.decode_step(x, cache, t)
            return (out, cache), out

        (_, _), ys = jax.lax.scan(
            step, (x0, cache), jnp.arange(steps))
        # ys: (steps, B, 1, D) -> (B, steps, D)
        return jnp.transpose(ys[:, :, 0], (1, 0, 2))

    got = generate(x0, memory)
    assert got.shape == (2, steps, 16)
    assert np.isfinite(np.asarray(got)).all()

    # replay the same autoregressive recurrence eagerly and compare
    x, cache = x0, dec.init_cache(memory, max_len=steps)
    outs = []
    for t in range(steps):
        x, cache = dec.decode_step(x, cache, t)
        outs.append(x)
    want = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_autoregressive_generate_greedy_matches_eager():
    from padertorch_tpu.contrib.mk.modules.transformer import (
        autoregressive_generate)
    from padertorch_tpu import nn
    ptrandom.seed(5)
    vocab, d = 11, 16
    dec = TransformerDecoder(
        d_model=d, num_layers=2, num_heads=4, use_rope=True).eval()
    ptrandom.seed(6)
    emb_w = _x((vocab, d), seed=8)
    head = nn.Linear(d, vocab)
    memory = _x((3, 4, d), seed=9)
    lens = [2, 4, 3]

    tokens, lengths = jax.jit(lambda m: autoregressive_generate(
        dec, m, embed=lambda t: emb_w[t], logits_head=head,
        bos_id=0, max_len=7, memory_seq_len=lens, eos_id=1))(memory)
    assert tokens.shape == (3, 7) and lengths.shape == (3,)

    # eager greedy replay must produce the same token sequence
    cache = dec.init_cache(memory, max_len=7)
    tok = jnp.zeros((3,), jnp.int32)
    outs = []
    done = np.zeros(3, bool)
    for t in range(7):
        out, cache = dec.decode_step(
            emb_w[tok][:, None], cache, t, memory_seq_len=lens)
        nxt = np.asarray(jnp.argmax(head(out[:, 0]), -1), dtype='int32')
        nxt = np.where(done, 1, nxt)
        done |= nxt == 1
        tok = jnp.asarray(nxt)
        outs.append(nxt)
    np.testing.assert_array_equal(np.asarray(tokens), np.stack(outs, 1))
    # lengths consistent with first eos position
    toks = np.asarray(tokens)
    for b in range(3):
        eos = np.nonzero(toks[b] == 1)[0]
        want = eos[0] + 1 if eos.size else 7
        assert lengths[b] == want, (b, toks[b], lengths[b])


def test_autoregressive_generate_sampling():
    from padertorch_tpu.contrib.mk.modules.transformer import (
        autoregressive_generate)
    from padertorch_tpu import nn
    ptrandom.seed(7)
    vocab, d = 9, 16
    dec = TransformerDecoder(
        d_model=d, num_layers=1, num_heads=4).eval()
    ptrandom.seed(8)
    emb_w = _x((vocab, d), seed=10)
    head = nn.Linear(d, vocab)
    memory = _x((2, 3, d), seed=11)

    def gen(temperature, top_k, key):
        return autoregressive_generate(
            dec, memory, embed=lambda t: emb_w[t], logits_head=head,
            bos_id=0, max_len=6, temperature=temperature, top_k=top_k,
            key=key)[0]

    k = jax.random.PRNGKey(0)
    a = gen(1.0, None, k)
    b = gen(1.0, None, k)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))  # reproducible
    c = gen(1.0, None, jax.random.PRNGKey(1))
    assert not np.array_equal(np.asarray(a), np.asarray(c))  # key matters
    # top_k=1 sampling collapses to greedy
    g = gen(0.0, None, k)
    t1 = gen(1e-6, 1, k)
    np.testing.assert_array_equal(np.asarray(g), np.asarray(t1))
    # temperature=0 requires no key, raises with sampling and no key
    with pytest.raises(ValueError):
        autoregressive_generate(
            dec, memory, embed=lambda t: emb_w[t], logits_head=head,
            bos_id=0, max_len=3, temperature=0.5)


def _beam_setup(vocab=3, d=16, layers=1, seed=20, batch=2, mem_t=3):
    from padertorch_tpu import nn
    ptrandom.seed(seed)
    dec = TransformerDecoder(
        d_model=d, num_layers=layers, num_heads=4).eval()
    ptrandom.seed(seed + 1)
    emb_w = _x((vocab, d), seed=seed + 2)
    head = nn.Linear(d, vocab)
    memory = _x((batch, mem_t, d), seed=seed + 3)
    return dec, emb_w, head, memory


def test_beam_size_one_equals_greedy():
    from padertorch_tpu.contrib.mk.modules.transformer import (
        autoregressive_generate, beam_search_generate)
    dec, emb_w, head, memory = _beam_setup(vocab=7, seed=30)
    greedy, _ = autoregressive_generate(
        dec, memory, embed=lambda t: emb_w[t], logits_head=head,
        bos_id=0, max_len=5, eos_id=1)
    beams, scores, lengths = beam_search_generate(
        dec, memory, embed=lambda t: emb_w[t], logits_head=head,
        bos_id=0, max_len=5, beam_size=1, eos_id=1)
    np.testing.assert_array_equal(
        np.asarray(beams[:, 0]), np.asarray(greedy))


def test_beam_search_is_exact_on_tiny_space():
    # beam wide enough to hold every prefix => beam search == exhaustive
    from padertorch_tpu.contrib.mk.modules.transformer import (
        beam_search_generate)
    vocab, steps = 3, 3
    dec, emb_w, head, memory = _beam_setup(vocab=vocab, seed=40, batch=2)

    beams, scores, lengths = jax.jit(lambda m: beam_search_generate(
        dec, m, embed=lambda t: emb_w[t], logits_head=head,
        bos_id=0, max_len=steps, beam_size=vocab ** (steps - 1)))(memory)

    # exhaustive: score every sequence with the one-shot decoder
    import itertools
    best = []
    for b in range(memory.shape[0]):
        best_s, best_seq = -np.inf, None
        for seq in itertools.product(range(vocab), repeat=steps):
            inp = emb_w[jnp.asarray((0,) + seq[:-1])][None]
            out = dec(inp, memory[b:b + 1])
            logp = jax.nn.log_softmax(head(out[0]), axis=-1)
            s = float(sum(logp[j, seq[j]] for j in range(steps)))
            if s > best_s:
                best_s, best_seq = s, seq
        best.append((best_seq, best_s))

    for b, (seq, s) in enumerate(best):
        np.testing.assert_array_equal(np.asarray(beams[b, 0]), seq)
        np.testing.assert_allclose(float(scores[b, 0]), s, rtol=1e-4)


def test_beam_search_eos_freezes_score():
    from padertorch_tpu.contrib.mk.modules.transformer import (
        beam_search_generate)
    dec, emb_w, head, memory = _beam_setup(vocab=5, seed=50, batch=1)
    beams, scores, lengths = beam_search_generate(
        dec, memory, embed=lambda t: emb_w[t], logits_head=head,
        bos_id=0, max_len=8, beam_size=4, eos_id=1)
    toks = np.asarray(beams[0])
    lens = np.asarray(lengths[0])
    for kb in range(4):
        if lens[kb] < 8:
            # after eos, every token must be eos
            assert toks[kb, lens[kb] - 1] == 1
            assert (toks[kb, lens[kb]:] == 1).all()
    # scores sorted best-first
    sc = np.asarray(scores[0])
    lp = sc / np.maximum(lens, 1) ** 0.0
    assert (np.diff(lp) <= 1e-6).all()


def test_beam_search_length_penalty_reorders():
    from padertorch_tpu.contrib.mk.modules.transformer import (
        beam_search_generate)
    dec, emb_w, head, memory = _beam_setup(vocab=5, seed=60, batch=2)
    b0 = beam_search_generate(
        dec, memory, embed=lambda t: emb_w[t], logits_head=head,
        bos_id=0, max_len=6, beam_size=3, eos_id=1)
    b1 = beam_search_generate(
        dec, memory, embed=lambda t: emb_w[t], logits_head=head,
        bos_id=0, max_len=6, beam_size=3, eos_id=1, length_penalty=1.0)
    # same beam set, possibly different order: compare as sets
    for b in range(2):
        s0 = {tuple(r) for r in np.asarray(b0[0][b])}
        s1 = {tuple(r) for r in np.asarray(b1[0][b])}
        assert s0 == s1
    # normalized ranking is non-increasing under the penalty
    sc, lens = np.asarray(b1[1]), np.asarray(b1[2])
    norm = sc / np.maximum(lens, 1) ** 1.0
    assert (np.diff(norm, axis=1) <= 1e-6).all()


def test_gqa_cache_is_smaller_and_decode_matches_forward():
    ptrandom.seed(30)
    mha = MultiheadAttention(16, 4, num_kv_heads=2, use_rope=True).eval()
    cache = mha.init_cache(batch_size=2, max_len=12)
    assert cache['k'].shape == (2, 2, 12, 4)  # Hkv=2, not H=4
    x = _x((2, 12, 16), seed=31)
    want = mha(x, causal=True)
    outs = []
    for t in range(12):
        out, cache = mha.decode_step(x[:, t:t + 1], cache, t)
        outs.append(out)
    np.testing.assert_allclose(
        np.asarray(jnp.concatenate(outs, 1)), np.asarray(want),
        rtol=1e-5, atol=1e-6)


def test_gqa_flash_backend_matches_dense():
    from padertorch_tpu.contrib.mk.modules.transformer import (
        set_attention_backend)
    ptrandom.seed(31)
    mha = MultiheadAttention(16, 4, num_kv_heads=1).eval()  # MQA
    x = _x((2, 24, 16), seed=32)
    want = mha(x, causal=True, key_padding_lens=[24, 17])
    set_attention_backend(mha, use_flash=True)
    got = mha(x, causal=True, key_padding_lens=[24, 17])
    for b, n in enumerate([24, 17]):
        np.testing.assert_allclose(
            np.asarray(got[b, :n]), np.asarray(want[b, :n]),
            rtol=1e-4, atol=1e-5)


def test_gqa_decoder_generation():
    from padertorch_tpu.contrib.mk.modules.transformer import (
        autoregressive_generate)
    from padertorch_tpu import nn
    ptrandom.seed(32)
    dec = TransformerDecoder(
        d_model=16, num_layers=2, num_heads=4, num_kv_heads=2,
        use_rope=True).eval()
    emb_w = _x((9, 16), seed=33)
    head = nn.Linear(16, 9)
    memory = _x((2, 4, 16), seed=34)
    toks, lens = jax.jit(lambda m: autoregressive_generate(
        dec, m, embed=lambda t: emb_w[t], logits_head=head,
        bos_id=0, max_len=6, eos_id=1))(memory)
    assert toks.shape == (2, 6)
    # chunked decode equals one-shot forward under GQA
    x = _x((2, 7, 16), seed=35)
    want = dec(x, memory)
    cache = dec.init_cache(memory, max_len=7)
    outs = []
    for t in range(7):
        out, cache = dec.decode_step(x[:, t:t + 1], cache, t)
        outs.append(out)
    np.testing.assert_allclose(
        np.asarray(jnp.concatenate(outs, 1)), np.asarray(want),
        rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize('opts', [
    dict(qk_norm='rms', use_rope=True),
    dict(qk_norm='l2'),
    dict(linear_attention_bias=True),
])
def test_decode_respects_attention_options(opts):
    # decode_step must mirror forward() for every option it accepts
    ptrandom.seed(40)
    mha = MultiheadAttention(16, 4, **opts).eval()
    x = _x((2, 10, 16), seed=41)
    want = mha(x, causal=True)
    cache = mha.init_cache(batch_size=2, max_len=10)
    outs = []
    for t in range(10):
        out, cache = mha.decode_step(x[:, t:t + 1], cache, t)
        outs.append(out)
    np.testing.assert_allclose(
        np.asarray(jnp.concatenate(outs, 1)), np.asarray(want),
        rtol=1e-4, atol=1e-5)


def test_cross_attend_cached_respects_options():
    # cross attention with bias_kv + qk_norm through the cache path
    ptrandom.seed(41)
    mha = MultiheadAttention(
        16, 4, d_kv=8, add_bias_kv=True, qk_norm='l2').eval()
    q = _x((2, 5, 16), seed=42)
    mem = _x((2, 7, 8), seed=43)
    want = mha(q, mem, key_padding_lens=[4, 7])
    kv = mha.precompute_kv(mem)
    got = mha.attend_cached(q, kv, key_padding_lens=[4, 7])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_decode_rejects_bias_kv():
    ptrandom.seed(42)
    mha = MultiheadAttention(16, 4, add_bias_kv=True).eval()
    cache = mha.init_cache(batch_size=1, max_len=4)
    with pytest.raises(AssertionError):
        mha.decode_step(_x((1, 1, 16), seed=44), cache, 0)


def test_generate_cache_uses_memory_dtype():
    # a bf16 serving model must get bf16 caches, not silent f32
    from padertorch_tpu.contrib.mk.modules.transformer import (
        autoregressive_generate)
    from padertorch_tpu import nn
    ptrandom.seed(43)
    dec = TransformerDecoder(d_model=16, num_layers=1, num_heads=4).eval()
    emb_w = _x((7, 16), seed=45)
    head = nn.Linear(16, 7)
    memory = _x((2, 3, 16), seed=46).astype(jnp.bfloat16)

    seen = {}
    orig = dec.init_cache

    def spy(mem, max_len, dtype=jnp.float32):
        cache = orig(mem, max_len, dtype=dtype)
        seen['dtype'] = cache['self'][0]['k'].dtype
        return cache

    dec.init_cache = spy
    toks, _ = autoregressive_generate(
        dec, memory, embed=lambda t: emb_w[t].astype(jnp.bfloat16),
        logits_head=head, bos_id=0, max_len=4)
    assert seen['dtype'] == jnp.bfloat16
    assert toks.shape == (2, 4)


def test_postnorm_cond_builds_no_dead_layer_scale():
    from padertorch_tpu.contrib.mk.modules.transformer import (
        TransformerEncoderLayer)
    ptrandom.seed(44)
    layer = TransformerEncoderLayer(
        16, 4, cond_dim=6, pre_norm=False).eval()
    # post-norm discards alpha, so the layer-scale head must not exist
    assert not layer.norm1.layer_scale
    assert layer.norm1.cond_layer.weight.shape == (6, 2 * 16)
    out = layer(_x((2, 5, 16), seed=47), cond=_x((2, 6), seed=48))
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize('opts', [
    dict(use_rope=True),
    dict(qk_norm='rms', use_rope=True),
    dict(linear_attention_bias=True),
    dict(num_kv_heads=2),
])
def test_rolling_cache_equals_windowed_forward(opts):
    # O(W) ring buffer == full causal + window(W-1, 0) attention,
    # exercised past the wraparound point (T >> W)
    ptrandom.seed(50)
    mha = MultiheadAttention(16, 4, **opts).eval()
    x = _x((2, 17, 16), seed=51)
    w = 5  # ring slots; left reach = 4
    want = mha(x, causal=True, attn_window=(w - 1, 0))
    cache = mha.init_rolling_cache(batch_size=2, window=w)
    assert cache['k'].shape[2] == w
    outs = []
    for t in range(17):
        out, cache = mha.decode_step_rolling(x[:, t:t + 1], cache, t)
        outs.append(out)
    np.testing.assert_allclose(
        np.asarray(jnp.concatenate(outs, 1)), np.asarray(want),
        rtol=1e-4, atol=1e-5)


def test_decoder_local_attention_rolling_decode():
    ptrandom.seed(51)
    dec = TransformerDecoder(
        d_model=16, num_layers=2, num_heads=4, use_rope=True,
        self_attn_window=4).eval()
    x = _x((2, 15, 16), seed=52)
    memory = _x((2, 5, 16), seed=53)
    want = dec(x, memory)   # forward applies the (4, 0) window

    cache = dec.init_cache(memory, max_len=15)
    # O(W): 5 ring slots, not 15
    assert cache['self'][0]['k'].shape[2] == 5
    outs = []
    for t in range(15):
        out, cache = dec.decode_step(x[:, t:t + 1], cache, t)
        outs.append(out)
    np.testing.assert_allclose(
        np.asarray(jnp.concatenate(outs, 1)), np.asarray(want),
        rtol=1e-4, atol=1e-5)


def test_local_attention_generation_scan():
    from padertorch_tpu.contrib.mk.modules.transformer import (
        autoregressive_generate)
    from padertorch_tpu import nn
    ptrandom.seed(52)
    dec = TransformerDecoder(
        d_model=16, num_layers=1, num_heads=4, use_rope=True,
        self_attn_window=3).eval()
    emb_w = _x((9, 16), seed=54)
    head = nn.Linear(16, 9)
    memory = _x((2, 4, 16), seed=55)
    toks, lens = jax.jit(lambda m: autoregressive_generate(
        dec, m, embed=lambda t: emb_w[t], logits_head=head,
        bos_id=0, max_len=12, eos_id=1))(memory)
    assert toks.shape == (2, 12)
    assert np.isfinite(np.asarray(lens)).all()


def test_speculative_equals_plain_greedy():
    # speculative decoding must be BIT-identical to the target's plain
    # greedy generation — with a perfect draft (the target itself,
    # every proposal accepted) and with an unrelated random draft
    # (most proposals rejected)
    from padertorch_tpu.contrib.mk.modules.transformer import (
        autoregressive_generate, speculative_generate)
    from padertorch_tpu import nn
    ptrandom.seed(60)
    target = TransformerDecoder(
        d_model=16, num_layers=2, num_heads=4, use_rope=True).eval()
    emb_w = _x((13, 16), seed=61)
    head = nn.Linear(16, 13)
    ptrandom.seed(61)
    draft = TransformerDecoder(
        d_model=16, num_layers=1, num_heads=2).eval()
    demb_w = _x((13, 16), seed=62)
    dhead = nn.Linear(16, 13)
    memory = _x((3, 4, 16), seed=63)
    lens = [2, 4, 3]

    want, _ = autoregressive_generate(
        target, memory, embed=lambda t: emb_w[t], logits_head=head,
        bos_id=0, max_len=9, memory_seq_len=lens)

    # perfect draft: the target drafts for itself
    got = speculative_generate(
        target, target, memory, embed=lambda t: emb_w[t],
        logits_head=head, draft_embed=lambda t: emb_w[t],
        draft_logits_head=head, bos_id=0, max_len=9, num_draft=3,
        memory_seq_len=lens)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    # unrelated draft: rejections exercise the rollback path
    got = jax.jit(lambda m: speculative_generate(
        target, draft, m, embed=lambda t: emb_w[t], logits_head=head,
        draft_embed=lambda t: demb_w[t], draft_logits_head=dhead,
        bos_id=0, max_len=9, num_draft=3, memory_seq_len=lens))(memory)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_speculative_with_gqa():
    # composes with grouped-query caches (local-attention/rolling
    # decoders are incompatible: verification needs Tq>1 decode)
    from padertorch_tpu.contrib.mk.modules.transformer import (
        autoregressive_generate, speculative_generate)
    from padertorch_tpu import nn
    ptrandom.seed(62)
    target = TransformerDecoder(
        d_model=16, num_layers=2, num_heads=4, num_kv_heads=2).eval()
    emb_w = _x((9, 16), seed=64)
    head = nn.Linear(16, 9)
    ptrandom.seed(63)
    draft = TransformerDecoder(
        d_model=16, num_layers=1, num_heads=2).eval()
    memory = _x((2, 3, 16), seed=65)
    want, _ = autoregressive_generate(
        target, memory, embed=lambda t: emb_w[t], logits_head=head,
        bos_id=0, max_len=7)
    got = speculative_generate(
        target, draft, memory, embed=lambda t: emb_w[t],
        logits_head=head, draft_embed=lambda t: emb_w[t],
        draft_logits_head=head, bos_id=0, max_len=7, num_draft=2)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
