"""Flash attention kernels vs the naive jnp reference (fwd + grads),
interpret mode on CPU (``ops/pallas/attention.py``)."""
import functools
import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from padertorch_tpu.ops.pallas.attention import flash_attention


def naive_attention(q, k, v, causal=False, key_padding_lens=None,
                    window=None):
    d = q.shape[-1]
    logits = jnp.einsum(
        'bhqd,bhkd->bhqk', q, k,
        preferred_element_type=jnp.float32) / math.sqrt(d)
    neg = -1e30
    if key_padding_lens is not None:
        lens = jnp.asarray(key_padding_lens)
        pad = jnp.arange(k.shape[2])[None, :] >= lens[:, None]
        logits = jnp.where(pad[:, None, None, :], neg, logits)
    if causal:
        cmask = (jnp.arange(k.shape[2])[None, :]
                 > jnp.arange(q.shape[2])[:, None])
        logits = jnp.where(cmask[None, None], neg, logits)
    if window is not None:
        left, right = window
        diff = (jnp.arange(k.shape[2])[None, :]
                - jnp.arange(q.shape[2])[:, None])  # col - row
        outside = jnp.zeros_like(diff, bool)
        if left is not None:
            outside = outside | (diff < -left)
        if right is not None:
            outside = outside | (diff > right)
        logits = jnp.where(outside[None, None], neg, logits)
    w = jax.nn.softmax(logits, axis=-1)
    # zero fully-masked rows (flash returns 0 there, softmax uniform)
    any_valid = jnp.max(logits, axis=-1, keepdims=True) > neg / 2
    w = jnp.where(any_valid, w, 0.0)
    return jnp.einsum('bhqk,bhkd->bhqd', w.astype(q.dtype), v)


def _rand(shape, seed):
    return jnp.asarray(
        np.random.RandomState(seed).randn(*shape), 'float32')


FLASH = functools.partial(flash_attention, block_q=16, block_k=16,
                          interpret=True)


@pytest.mark.parametrize('causal', [False, True])
def test_flash_forward_matches_naive(causal):
    q = _rand((2, 2, 32, 8), 0)
    k = _rand((2, 2, 48, 8), 1)
    v = _rand((2, 2, 48, 8), 2)
    out = FLASH(q, k, v, causal=causal)
    ref = naive_attention(q, k, v, causal=causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5)


def test_flash_key_padding_and_ragged_shapes():
    # Tq/Tk not multiples of the block sizes; per-example lens
    q = _rand((3, 2, 21, 8), 3)
    k = _rand((3, 2, 35, 8), 4)
    v = _rand((3, 2, 35, 8), 5)
    lens = [35, 20, 1]
    out = FLASH(q, k, v, key_padding_lens=lens)
    ref = naive_attention(q, k, v, key_padding_lens=lens)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5)


def test_flash_causal_with_key_padding():
    q = _rand((2, 1, 24, 8), 6)
    k = _rand((2, 1, 24, 8), 7)
    v = _rand((2, 1, 24, 8), 8)
    lens = [24, 10]
    out = FLASH(q, k, v, causal=True, key_padding_lens=lens)
    ref = naive_attention(q, k, v, causal=True, key_padding_lens=lens)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5)


@pytest.mark.parametrize('causal', [False, True])
def test_flash_gradients_match_naive(causal):
    q = _rand((2, 2, 24, 8), 9)
    k = _rand((2, 2, 32, 8), 10)
    v = _rand((2, 2, 32, 8), 11)
    lens = [32, 17]
    t = _rand((2, 2, 24, 8), 12)  # cotangent-shaping target

    def loss(fn, q, k, v):
        out = fn(q, k, v, causal=causal, key_padding_lens=lens)
        return jnp.sum((out - t) ** 2)

    g_flash = jax.grad(functools.partial(loss, FLASH), argnums=(0, 1, 2))(
        q, k, v)
    g_ref = jax.grad(
        functools.partial(loss, naive_attention), argnums=(0, 1, 2))(
        q, k, v)
    for gf, gr, name in zip(g_flash, g_ref, 'qkv'):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), atol=5e-4, err_msg=name)


def test_flash_zero_length_sequence_is_finite():
    q = _rand((2, 1, 16, 8), 13)
    k = _rand((2, 1, 16, 8), 14)
    v = _rand((2, 1, 16, 8), 15)
    lens = [16, 0]

    def loss(q, k, v):
        return jnp.sum(FLASH(q, k, v, key_padding_lens=lens) ** 2)

    out = FLASH(q, k, v, key_padding_lens=lens)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_array_equal(np.asarray(out[1]), 0.0)
    grads = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()
    # masked example contributes zero gradient
    np.testing.assert_array_equal(np.asarray(grads[1][1]), 0.0)


def test_flash_head_dim_padding():
    # D=5 pads to a full lane; output sliced back, grads exact
    q = _rand((1, 2, 16, 5), 16)
    k = _rand((1, 2, 16, 5), 17)
    v = _rand((1, 2, 16, 5), 18)
    out = FLASH(q, k, v)
    ref = naive_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5)

    g = jax.grad(lambda a: jnp.sum(FLASH(a, k, v) ** 2))(q)
    gr = jax.grad(lambda a: jnp.sum(naive_attention(a, k, v) ** 2))(q)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gr), atol=5e-4)


def test_flash_bf16_inputs():
    q = _rand((1, 1, 16, 8), 19).astype(jnp.bfloat16)
    k = _rand((1, 1, 16, 8), 20).astype(jnp.bfloat16)
    v = _rand((1, 1, 16, 8), 21).astype(jnp.bfloat16)
    out = FLASH(q, k, v)
    assert out.dtype == jnp.bfloat16
    ref = naive_attention(
        q.astype(jnp.float32), k.astype(jnp.float32),
        v.astype(jnp.float32))
    np.testing.assert_allclose(
        np.asarray(out, dtype='float32'), np.asarray(ref), atol=3e-2)


@pytest.mark.parametrize('window', [(8, 8), (5, 2), (0, 6), (None, 3),
                                    (7, None)])
def test_flash_window_matches_naive(window):
    # band spans multiple 16-blocks and clips at both edges
    q = _rand((2, 2, 40, 8), 50)
    k = _rand((2, 2, 40, 8), 51)
    v = _rand((2, 2, 40, 8), 52)
    lens = [40, 23]
    out = FLASH(q, k, v, window=window, key_padding_lens=lens)
    ref = naive_attention(q, k, v, window=window, key_padding_lens=lens)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5)


def test_flash_window_with_causal():
    q = _rand((1, 2, 33, 8), 53)
    k = _rand((1, 2, 33, 8), 54)
    v = _rand((1, 2, 33, 8), 55)
    out = FLASH(q, k, v, window=(10, None), causal=True)
    ref = naive_attention(q, k, v, window=(10, None), causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5)


def test_flash_window_gradients():
    q = _rand((2, 1, 30, 8), 56)
    k = _rand((2, 1, 30, 8), 57)
    v = _rand((2, 1, 30, 8), 58)
    lens = [30, 19]
    t = _rand((2, 1, 30, 8), 59)

    def loss(fn, q, k, v):
        out = fn(q, k, v, window=(6, 4), key_padding_lens=lens)
        return jnp.sum((out - t) ** 2)

    g_flash = jax.grad(functools.partial(loss, FLASH), argnums=(0, 1, 2))(
        q, k, v)
    g_ref = jax.grad(
        functools.partial(loss, naive_attention), argnums=(0, 1, 2))(
        q, k, v)
    for gf, gr, name in zip(g_flash, g_ref, 'qkv'):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), atol=5e-4, err_msg=name)


def test_flash_window_matches_longformer_bias():
    # the (ceil(w/2)-1, w//2) window equals the mk Longformer additive
    # bias exactly (reference components.py:346 band convention)
    from padertorch_tpu.contrib.mk.modules.features.wav2vec2 import (
        longformer_bias)
    w = 10
    t = 37
    q = _rand((1, 2, t, 8), 60)
    k = _rand((1, 2, t, 8), 61)
    v = _rand((1, 2, t, 8), 62)
    bias = longformer_bias(w, t)
    logits = jnp.einsum(
        'bhqd,bhkd->bhqk', q, k,
        preferred_element_type=jnp.float32) / math.sqrt(8) + bias
    ref = jnp.einsum('bhqk,bhkd->bhqd',
                     jax.nn.softmax(logits, -1).astype(q.dtype), v)
    out = FLASH(q, k, v, window=(math.ceil(w / 2) - 1, w // 2))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5)


def test_multihead_attention_flash_backend_matches_naive():
    import padertorch_tpu as pt
    from padertorch_tpu.contrib.mk.modules.transformer import (
        MultiheadAttention, set_attention_backend)

    pt.random.seed(0)
    mha = MultiheadAttention(16, 2, use_rope=True)
    mha.eval()
    x = _rand((2, 12, 16), 30)
    lens = [12, 7]
    ref = mha(x, key_padding_lens=lens, causal=True)
    set_attention_backend(mha, use_flash=True)
    assert mha.use_flash
    out = mha(x, key_padding_lens=lens, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5)
    # attn_bias forces the dense path (still correct)
    bias = jnp.zeros((1, 1, 12, 12))
    np.testing.assert_allclose(
        np.asarray(mha(x, attn_bias=bias)),
        np.asarray(mha(x)), atol=2e-5)


def test_set_attention_backend_reaches_nested_encoders():
    import padertorch_tpu as pt
    from padertorch_tpu.contrib.mk.modules.transformer import (
        TransformerEncoder, set_attention_backend)

    pt.random.seed(1)
    enc = TransformerEncoder(
        d_model=16, num_layers=2, num_heads=2, input_size=8)
    enc.eval()
    x = _rand((2, 10, 8), 31)
    ref = enc(x, seq_len=[10, 6])
    set_attention_backend(enc, use_flash=True)
    flipped = [
        layer.self_attn.use_flash for layer in enc.layers]
    assert all(flipped), flipped
    out = enc(x, seq_len=[10, 6])
    r = ref[0] if isinstance(ref, tuple) else ref
    o = out[0] if isinstance(out, tuple) else out
    np.testing.assert_allclose(np.asarray(o), np.asarray(r), atol=5e-5)


def test_flash_backend_gradients_through_mha():
    import padertorch_tpu as pt
    from padertorch_tpu.module import partition, combine
    from padertorch_tpu.contrib.mk.modules.transformer import (
        MultiheadAttention, set_attention_backend)

    pt.random.seed(2)
    mha = MultiheadAttention(16, 2)
    mha.eval()
    x = _rand((2, 9, 16), 32)

    def loss(params, static, use_flash):
        m = combine(params, static)
        set_attention_backend(m, use_flash=use_flash)
        return jnp.sum(m(x, key_padding_lens=[9, 5]) ** 2)

    params, static = partition(mha)
    g_flash = jax.grad(loss)(params, static, True)
    g_ref = jax.grad(loss)(params, static, False)
    for gf, gr in zip(jax.tree_util.tree_leaves(g_flash),
                      jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), atol=1e-3)


def test_je_mha_flash_matches_dense_bidirectional():
    import padertorch_tpu as pt
    from padertorch_tpu.contrib.je.modules.transformer import (
        MultiHeadAttention)
    from padertorch_tpu.contrib.mk.modules.transformer import (
        set_attention_backend)

    pt.random.seed(3)
    mha = MultiHeadAttention(8, 8, 8, 16, 8, num_heads=2,
                             bidirectional=True)
    x = _rand((2, 13, 8), 40)
    ref, w = mha(x, x, x, seq_len=[13, 6])
    assert w is not None
    set_attention_backend(mha)
    out, w2 = mha(x, x, x, seq_len=[13, 6])
    assert w2 is None  # flash does not materialize weights
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-5)


def test_je_mha_flash_matches_dense_causal_equal_lengths():
    import padertorch_tpu as pt
    from padertorch_tpu.contrib.je.modules.transformer import (
        MultiHeadAttention)

    pt.random.seed(4)
    mha = MultiHeadAttention(8, 8, 8, 16, 8, num_heads=2,
                             bidirectional=False)
    x = _rand((2, 12, 8), 41)
    ref, _ = mha(x, x, x)
    mha.use_flash = True
    out, _ = mha(x, x, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-5)
    # Tq != Tk (streaming state) falls back to the dense key-aligned
    # causal path and still returns weights
    k = _rand((2, 20, 8), 42)
    out2, w = mha(x, k, k)
    assert w is not None and out2.shape == (2, 12, 8)


def test_je_transformer_stack_flash_backend():
    import padertorch_tpu as pt
    from padertorch_tpu.contrib.je.modules.transformer import (
        TransformerLayerStack)
    from padertorch_tpu.contrib.mk.modules.transformer import (
        set_attention_backend)

    pt.random.seed(5)
    stack = TransformerLayerStack(8, 6, 20, 2, 2, bidirectional=True)
    stack.eval()
    x = _rand((2, 9, 8), 43)
    ref = stack(x, seq_len=[9, 5])[0]
    set_attention_backend(stack)
    out = stack(x, seq_len=[9, 5])[0]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-5)


@pytest.mark.parametrize('h_kv', [1, 2])
def test_flash_gqa_matches_repeated_kv(h_kv):
    # Hkv KV heads shared by groups of H//Hkv query heads == dense
    # attention against explicitly repeated KV
    h = 4
    q = _rand((2, h, 32, 8), 70)
    k = _rand((2, h_kv, 32, 8), 71)
    v = _rand((2, h_kv, 32, 8), 72)
    lens = [32, 20]
    out = FLASH(q, k, v, key_padding_lens=lens)
    rep = h // h_kv
    ref = naive_attention(
        q, jnp.repeat(k, rep, 1), jnp.repeat(v, rep, 1),
        key_padding_lens=lens)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5)


def test_flash_gqa_gradients_sum_over_groups():
    h, h_kv = 4, 2
    q = _rand((1, h, 24, 8), 73)
    k = _rand((1, h_kv, 24, 8), 74)
    v = _rand((1, h_kv, 24, 8), 75)
    t = _rand((1, h, 24, 8), 76)

    def loss_flash(q, k, v):
        return jnp.sum((FLASH(q, k, v, causal=True) - t) ** 2)

    def loss_ref(q, k, v):
        out = naive_attention(
            q, jnp.repeat(k, h // h_kv, 1), jnp.repeat(v, h // h_kv, 1),
            causal=True)
        return jnp.sum((out - t) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for f, r, name in zip(gf, gr, 'qkv'):
        assert f.shape == r.shape, (name, f.shape, r.shape)
        np.testing.assert_allclose(np.asarray(f), np.asarray(r),
                                   atol=5e-4, err_msg=name)


def test_flash_gqa_with_window():
    q = _rand((1, 4, 40, 8), 77)
    k = _rand((1, 2, 40, 8), 78)
    v = _rand((1, 2, 40, 8), 79)
    out = FLASH(q, k, v, window=(6, 3))
    ref = naive_attention(
        q, jnp.repeat(k, 2, 1), jnp.repeat(v, 2, 1), window=(6, 3))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5)


@pytest.mark.parametrize('seed', range(8))
def test_flash_fuzz_random_configs(seed):
    # randomized sweep over shape x mask-feature combinations: every
    # config must match the dense reference (fwd) bit-for-tolerance
    rng = np.random.RandomState(1000 + seed)
    b = int(rng.randint(1, 3))
    h_kv = int(rng.choice([1, 2]))
    group = int(rng.choice([1, 2, 3]))
    h = h_kv * group
    tq = int(rng.randint(1, 70))
    tk = tq if rng.rand() < 0.7 else int(rng.randint(1, 70))
    d = int(rng.choice([4, 8, 16]))
    causal = bool(rng.rand() < 0.5) and tq == tk
    window = None
    if rng.rand() < 0.6:
        left = None if rng.rand() < 0.2 else int(rng.randint(0, 20))
        right = None if rng.rand() < 0.2 else int(rng.randint(0, 20))
        if (left, right) != (None, None):
            window = (left, right)
    lens = (rng.randint(1, tk + 1, size=b).tolist()
            if rng.rand() < 0.7 else None)

    q = _rand((b, h, tq, d), seed * 10 + 1)
    k = _rand((b, h_kv, tk, d), seed * 10 + 2)
    v = _rand((b, h_kv, tk, d), seed * 10 + 3)
    out = FLASH(q, k, v, causal=causal, window=window,
                key_padding_lens=lens)
    ref = naive_attention(
        q, jnp.repeat(k, group, 1), jnp.repeat(v, group, 1),
        causal=causal, window=window, key_padding_lens=lens)
    got, want = np.asarray(out), np.asarray(ref)
    # don't-care rows: queries whose whole mask row is empty produce 0
    # in both (naive_attention zeroes them too)
    np.testing.assert_allclose(
        got, want, atol=3e-5,
        err_msg=f'{b=} {h=} {h_kv=} {tq=} {tk=} {d=} {causal=} '
                f'{window=} {lens=}')


def test_should_use_flash_never_on_cpu():
    from padertorch_tpu.ops.pallas.attention import should_use_flash
    # the Pallas interpreter is a test vehicle, never a performance win
    assert jax.default_backend() != 'tpu'
    assert not should_use_flash(8192, causal=True)
    assert not should_use_flash(8192, window=(256, 256))


def test_should_use_flash_measured_crossover(monkeypatch):
    from padertorch_tpu.ops.pallas import attention as A
    monkeypatch.setattr(jax, 'default_backend', lambda: 'tpu')
    # full attention: XLA's fused-materializing path wins short
    # sequences, the kernel wins past the measured crossover
    assert not A.should_use_flash(512)
    assert A.should_use_flash(A._FLASH_MIN_T_FULL)
    # causal crosses earlier (the kernel skips above-diagonal blocks)
    assert not A.should_use_flash(256, causal=True)
    assert A.should_use_flash(A._FLASH_MIN_T_CAUSAL, causal=True)
    assert (A._FLASH_MIN_T_CAUSAL <= A._FLASH_MIN_T_FULL)
    # banded attention crosses earliest (O(T*W) vs O(T^2))
    assert A.should_use_flash(A._FLASH_MIN_T_WINDOW, window=(128, 128))
    # window=(None, None) means "no band": full-attention threshold
    assert A.should_use_flash(8192, window=(None, None))
    assert not A.should_use_flash(512, window=(None, None))
    # cross-attention: the longer side sets the cost
    assert A.should_use_flash(128, A._FLASH_MIN_T_FULL)


def test_mha_auto_dispatch_runs_dense_on_cpu():
    """Default use_flash='auto' must pick the dense path on CPU — the
    outputs (incl. at shapes where a TPU would pick the kernel) equal
    the explicit use_flash=False ones."""
    import padertorch_tpu as pt
    from padertorch_tpu.contrib.mk.modules.transformer import (
        MultiheadAttention)

    pt.random.seed(5)
    mha = MultiheadAttention(16, 2)
    assert mha.use_flash == 'auto'
    mha.eval()
    x = _rand((1, 8, 16), 50)
    out_auto = mha(x, causal=True)
    mha.use_flash = False
    out_dense = mha(x, causal=True)
    np.testing.assert_array_equal(
        np.asarray(out_auto), np.asarray(out_dense))


def test_mha_auto_dispatch_uses_kernel_past_crossover(monkeypatch):
    """With the backend reporting 'tpu', 'auto' must route long causal
    sequences to the fused kernel (verified by intercepting it)."""
    import padertorch_tpu as pt
    from padertorch_tpu.ops.pallas import attention as A
    from padertorch_tpu.contrib.mk.modules import transformer as Tr

    monkeypatch.setattr(jax, 'default_backend', lambda: 'tpu')
    calls = {}
    real = A.flash_attention

    def spy(q, k, v, **kw):
        calls['t'] = q.shape[2]
        kw['interpret'] = True  # still on CPU in this test
        return real(q, k, v, **kw)

    monkeypatch.setattr(A, 'flash_attention', spy)
    pt.random.seed(6)
    mha = Tr.MultiheadAttention(16, 2)
    mha.eval()
    t = A._FLASH_MIN_T_CAUSAL
    x = _rand((1, t, 16), 51)
    mha(x, causal=True)
    assert calls.get('t') == t, 'kernel not dispatched past crossover'
    calls.clear()
    mha(_rand((1, 64, 16), 52), causal=True)
    assert 't' not in calls, 'kernel dispatched below crossover'


def test_auto_blocks_measured_optima():
    """The default (block_q=None) tiles must be the swept v5e optima:
    512-wide blocks past the 128x128 default (1.7-4.3x faster), a
    narrower 256 query block under causal/banded pruning, and a
    256x256 fallback once the backward's full-row VMEM residents
    (T * d_p) pass the verified budget (the kernel raises
    vmem_limit_bytes to the physical 128 MiB; T*d_p = 4096*128 is
    measured, the fallback starts past 8192*128)."""
    from padertorch_tpu.ops.pallas.attention import _auto_blocks

    assert _auto_blocks(2048, 2048, 128, False, (None, None)) == (512, 512)
    assert _auto_blocks(2048, 2048, 128, True, (None, None)) == (512, 512)
    # banded: a narrower query block tracks the band more tightly
    assert _auto_blocks(2048, 2048, 128, False, (255, 256)) == (256, 512)
    assert _auto_blocks(4096, 4096, 128, False, (255, 256)) == (256, 512)
    assert _auto_blocks(4096, 4096, 128, False, (None, 256)) == (256, 512)
    # window=(None, None) means "no band" -> full-attention tiles
    assert _auto_blocks(2048, 2048, 128, False, None) == (512, 512)
    # wide tiles hold through the measured T=4096 @ d_p=128 point...
    assert _auto_blocks(4096, 4096, 128, False, None) == (512, 512)
    assert _auto_blocks(4096, 4096, 128, True, None) == (512, 512)
    assert _auto_blocks(8192, 8192, 128, True, None) == (512, 512)
    # ...and drop to 256x256 past the verified budget; a doubled head
    # dim halves the T at which that happens
    assert _auto_blocks(16384, 16384, 128, False, None) == (256, 256)
    assert _auto_blocks(16384, 16384, 128, True, None) == (256, 256)
    assert _auto_blocks(8192, 8192, 256, False, None)[0] <= 256
    # cross-attention: the longer side sets the VMEM budget
    assert _auto_blocks(128, 32768, 128, False, None) == (128, 256)
    # never tile wider than the lane-padded sequence
    assert _auto_blocks(13, 100, 128, False, None) == (128, 128)
    assert _auto_blocks(300, 300, 128, False, None) == (384, 384)


def test_flash_auto_blocks_match_explicit():
    """block_q=block_k=None (auto) must be numerically identical to an
    explicit 128x128 tiling — tiles change scheduling, not math."""
    q = _rand((1, 2, 300, 16), 60)
    k = _rand((1, 2, 200, 16), 61)
    v = _rand((1, 2, 200, 16), 62)
    lens = jnp.asarray([150])
    for causal, window in [(False, None), (False, (32, 16)),
                           (True, None)]:
        if causal:
            q2, k2, v2 = q[:, :, :200], k, v
        else:
            q2, k2, v2 = q, k, v
        auto = flash_attention(
            q2, k2, v2, causal=causal, window=window,
            key_padding_lens=lens, interpret=True)
        explicit = flash_attention(
            q2, k2, v2, causal=causal, window=window,
            key_padding_lens=lens, block_q=128, block_k=128,
            interpret=True)
        np.testing.assert_allclose(
            np.asarray(auto), np.asarray(explicit), atol=2e-6,
            err_msg=f'{causal=} {window=}')
