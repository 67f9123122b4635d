"""Long-tail MultiheadAttention options (reference
``mk/modules/transformer.py:549-766``): separate k/v input dims,
bias-free projections, q/k RMS- and L2-normalization, the learned
bias-kv token, the symmetric linear attention bias, and
magnitude-preserving projections — each checked against an independent
numpy re-execution of the reference math."""
import numpy as np
import pytest

import jax.numpy as jnp

from padertorch_tpu import random as ptrandom
from padertorch_tpu.contrib.mk.modules.transformer import (
    MultiheadAttention)


def _arr(shape, seed):
    return np.random.default_rng(seed).normal(
        size=shape).astype('float32')


def _np_linear(layer, x):
    w = np.asarray(layer.weight)  # nn.Linear stores (in, out)
    y = x @ w
    if getattr(layer, 'bias', None) is not None:
        y = y + np.asarray(layer.bias)
    return y


def _np_mha(mha, query, key=None, value=None, lens=None,
            qk_norm=None, linear_bias=False, bias_kv=False):
    """Independent numpy re-execution of the reference attention math."""
    h, dh = mha.num_heads, mha.d_head
    if key is None:
        key = query
    if value is None:
        value = key
    if bias_kv:
        key = np.concatenate(
            [key, np.broadcast_to(np.asarray(mha.bias_k),
                                  (key.shape[0], 1, key.shape[-1]))], 1)
        value = np.concatenate(
            [value, np.broadcast_to(np.asarray(mha.bias_v),
                                    (value.shape[0], 1,
                                     value.shape[-1]))], 1)

    def split(x):
        b, t, _ = x.shape
        return x.reshape(b, t, h, dh).transpose(0, 2, 1, 3)

    q = split(_np_linear(mha.q_proj, query))
    k = split(_np_linear(mha.k_proj, key))
    v = split(_np_linear(mha.v_proj, value))
    if qk_norm == 'rms':
        def rms(x, norm):
            y = x / np.sqrt(np.mean(x ** 2, -1, keepdims=True)
                            + norm.eps)
            return y * np.asarray(norm.weight)
        q, k = rms(q, mha.q_norm), rms(k, mha.k_norm)
    if qk_norm == 'l2':
        q = q / np.linalg.norm(q, axis=-1, keepdims=True)
        k = k / np.linalg.norm(k, axis=-1, keepdims=True)
    logits = np.einsum('bhqd,bhkd->bhqk', q, k) / np.sqrt(dh)
    if linear_bias:
        tq, tk = q.shape[2], k.shape[2]
        dist = -np.abs(np.arange(tk)[None, :] - np.arange(tq)[:, None])
        slopes = np.linspace(8.0 / h, 8.0, h)
        logits = logits + slopes[None, :, None, None] * dist[None, None]
    if lens is not None:
        pos = np.arange(k.shape[2])
        pad = pos[None, :] >= np.asarray(lens)[:, None]
        if bias_kv:
            pad = pad & (pos[None, :] != k.shape[2] - 1)
        logits = np.where(pad[:, None, None, :], -1e30, logits)
    w = np.exp(logits - logits.max(-1, keepdims=True))
    w = w / w.sum(-1, keepdims=True)
    out = np.einsum('bhqk,bhkd->bhqd', w, v)
    b, _, t, _ = out.shape
    return _np_linear(
        mha.out_proj, out.transpose(0, 2, 1, 3).reshape(b, t, h * dh))


def test_separate_kv_dims_and_no_bias():
    ptrandom.seed(0)
    mha = MultiheadAttention(16, 4, d_kv=6, d_v=10, bias=False).eval()
    assert mha.q_proj.bias is None and mha.out_proj.bias is None
    q, k, v = _arr((2, 5, 16), 1), _arr((2, 7, 6), 2), _arr((2, 7, 10), 3)
    got = mha(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    want = _np_mha(mha, q, k, v)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4,
                               atol=1e-5)


@pytest.mark.parametrize('norm', ['rms', 'l2'])
def test_qk_norm(norm):
    ptrandom.seed(1)
    mha = MultiheadAttention(16, 4, qk_norm=norm).eval()
    x = _arr((2, 6, 16), 4)
    got = mha(jnp.asarray(x))
    want = _np_mha(mha, x, qk_norm=norm)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4,
                               atol=1e-5)


def test_linear_attention_bias():
    ptrandom.seed(2)
    mha = MultiheadAttention(16, 4, linear_attention_bias=True).eval()
    x = _arr((2, 8, 16), 5)
    got = mha(jnp.asarray(x), key_padding_lens=[6, 8])
    want = _np_mha(mha, x, lens=[6, 8], linear_bias=True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4,
                               atol=1e-5)


def test_add_bias_kv_with_padding():
    ptrandom.seed(3)
    mha = MultiheadAttention(16, 4, add_bias_kv=True, d_kv=6).eval()
    q, k = _arr((2, 5, 16), 6), _arr((2, 7, 6), 7)
    got = mha(jnp.asarray(q), jnp.asarray(k), key_padding_lens=[4, 7])
    want = _np_mha(mha, q, k, lens=[4, 7], bias_kv=True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4,
                               atol=1e-5)
    # the bias token must actually matter
    mha.bias_k = mha.bias_k + 5.0
    got2 = mha(jnp.asarray(q), jnp.asarray(k), key_padding_lens=[4, 7])
    assert np.abs(np.asarray(got2) - np.asarray(got)).max() > 1e-3


def test_add_bias_kv_rejects_causal():
    ptrandom.seed(4)
    mha = MultiheadAttention(16, 4, add_bias_kv=True).eval()
    x = jnp.asarray(_arr((1, 4, 16), 8))
    with pytest.raises(AssertionError):
        mha(x, causal=True)


def test_magnitude_preserving_projections():
    # projection-level equivalence is covered by the MPLinear tests in
    # test_mk_transformer.py; here: the flag routes all four
    # projections through MPLinear and the full attention stays sane
    from padertorch_tpu.contrib.mk.modules.transformer import MPLinear
    ptrandom.seed(5)
    mha = MultiheadAttention(16, 4, magnitude_preserving=True).eval()
    for proj in (mha.q_proj, mha.k_proj, mha.v_proj, mha.out_proj):
        assert isinstance(proj, MPLinear) and proj.magnitude_preserving
    x = jnp.asarray(_arr((2, 6, 16), 9))
    out = mha(x)
    assert out.shape == (2, 6, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_cond_layer_norm_adaln():
    from padertorch_tpu.contrib.mk.modules.transformer import (
        CondLayerNorm)
    ptrandom.seed(10)
    norm = CondLayerNorm(8, cond_dim=4, layer_scale=True).eval()
    x = _arr((2, 5, 8), 20)
    c = _arr((2, 4), 21)
    y, alpha = norm(jnp.asarray(x), jnp.asarray(c))
    assert y.shape == (2, 5, 8) and alpha.shape == (2, 1, 8)
    # numpy re-execution: unaffine layernorm * gamma + beta
    mean = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    n = (x - mean) / np.sqrt(var + norm.eps)
    params = c @ np.asarray(norm.cond_layer.weight) + np.asarray(
        norm.cond_layer.bias)
    gamma, beta, a = np.split(params, 3, axis=-1)
    np.testing.assert_allclose(
        np.asarray(y), n * gamma[:, None] + beta[:, None],
        rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(alpha), a[:, None], rtol=1e-5)
    # without cond: plain unaffine layer norm, no layer scale
    y0, a0 = norm(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y0), n, rtol=1e-4, atol=1e-5)
    assert a0 is None


def test_cond_layer_norm_zero_init_is_identity_gate():
    from padertorch_tpu.contrib.mk.modules.transformer import (
        CondLayerNorm)
    ptrandom.seed(11)
    norm = CondLayerNorm(8, cond_dim=4, layer_scale=True,
                         zero_init=True).eval()
    c = jnp.asarray(_arr((2, 4), 22))
    _, alpha = norm(jnp.asarray(_arr((2, 5, 8), 23)), c)
    np.testing.assert_allclose(np.asarray(alpha), 0.0, atol=0)


def test_encoder_layer_conditioning():
    from padertorch_tpu.contrib.mk.modules.transformer import (
        TransformerEncoder)
    ptrandom.seed(12)
    enc = TransformerEncoder(
        d_model=16, num_layers=2, num_heads=4, cond_dim=6).eval()
    x = jnp.asarray(_arr((2, 7, 16), 24))
    c1 = jnp.asarray(_arr((2, 6), 25))
    c2 = jnp.asarray(_arr((2, 6), 26))
    y1 = enc(x, cond=c1)
    y2 = enc(x, cond=c2)
    assert y1.shape == (2, 7, 16)
    # the condition must modulate the output
    assert np.abs(np.asarray(y1) - np.asarray(y2)).max() > 1e-4
    import jax
    g = jax.grad(lambda c: jnp.sum(enc(x, cond=c) ** 2))(c1)
    assert np.isfinite(np.asarray(g)).all() and np.abs(
        np.asarray(g)).max() > 0


def test_normalize_skip_connections_preserves_norm():
    from padertorch_tpu.contrib.mk.modules.transformer import (
        TransformerEncoderLayer)
    ptrandom.seed(13)
    layer = TransformerEncoderLayer(
        16, 4, normalize_skip_connections=True).eval()
    x = jnp.asarray(_arr((2, 5, 16), 27))
    h, _ = layer._norm(layer.norm1, x, None)
    out = layer._residual(x, h)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out), axis=-1),
        np.linalg.norm(np.asarray(x), axis=-1), rtol=1e-4)


def test_ffn_pre_activation():
    from padertorch_tpu.contrib.mk.modules.transformer import _FFN
    import jax
    ptrandom.seed(14)
    ffn = _FFN(8, 16, pre_activation=True).eval()
    x = _arr((2, 3, 8), 28)
    got = ffn(jnp.asarray(x))
    h = jax.nn.gelu(jnp.asarray(x))
    want = ffn.lin2(jax.nn.gelu(ffn.lin1(h)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)
