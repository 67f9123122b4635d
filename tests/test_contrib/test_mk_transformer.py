"""Tests for the mk transformer long tail: positional encodings,
interleave, magnitude-preserving Linear.

Torch-oracle tests re-execute the reference math
(``padertorch/contrib/mk/modules/transformer.py:28,47,59,113``) and
compare elementwise.
"""
import math

import numpy as np
import jax.numpy as jnp
import pytest

import padertorch_tpu as pt
from padertorch_tpu.contrib.mk.modules.transformer import (
    MPLinear, PositionalEncoding, interleave, positional_embedding)


def reference_positional_embedding(d_model, max_len=5000):
    """Numpy re-execution of the reference's positional_embedding
    (mk/transformer.py:47), including its non-Vaswani frequency base."""
    position = np.arange(max_len)[:, None]
    half = d_model // 2
    div_term = np.exp(
        np.arange(0, half) * (-math.log(float(max_len)) / half))
    pe = np.zeros((max_len, 1, d_model))
    pe[:, 0, 0::2] = np.sin(position * div_term)
    pe[:, 0, 1::2] = np.cos(position * div_term)
    return pe


def test_positional_embedding_matches_reference_math():
    got = np.asarray(positional_embedding(16, max_len=100))
    want = reference_positional_embedding(16, max_len=100)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_positional_embedding_matches_torch_reference():
    torch = pytest.importorskip('torch')
    d_model, max_len = 8, 64
    position = torch.arange(max_len).unsqueeze(1)
    half = d_model // 2
    div_term = torch.exp(
        torch.arange(0, half) * (-math.log(float(max_len)) / half))
    pe = torch.zeros(max_len, 1, d_model)
    pe[:, 0, 0::2] = torch.sin(position * div_term)
    pe[:, 0, 1::2] = torch.cos(position * div_term)
    got = np.asarray(positional_embedding(d_model, max_len=max_len))
    np.testing.assert_allclose(got, pe.numpy(), atol=1e-5)


def test_positional_encoding_batch_first_and_time_first_agree():
    pt.random.seed(0)
    enc_bf = PositionalEncoding(8, max_len=32, batch_first=True).eval()
    enc_tf = PositionalEncoding(8, max_len=32, batch_first=False).eval()
    x = jnp.asarray(np.random.RandomState(0).randn(2, 5, 8), 'float32')
    out_bf = enc_bf(x)                                 # (B, T, D)
    out_tf = enc_tf(jnp.swapaxes(x, 0, 1))             # (T, B, D)
    np.testing.assert_allclose(
        np.asarray(out_bf), np.asarray(jnp.swapaxes(out_tf, 0, 1)),
        atol=1e-6)
    # encoding is additive: subtracting the input recovers the table
    np.testing.assert_allclose(
        np.asarray(out_bf - x)[0],
        np.asarray(positional_embedding(8, 32))[:5, 0], atol=1e-6)


def test_interleave_matches_torch():
    torch = pytest.importorskip('torch')
    rng = np.random.RandomState(0)
    x, y = rng.randn(3, 4, 5), rng.randn(3, 4, 5)
    for dim in (0, 1, 2, -1):
        tx, ty = torch.tensor(x), torch.tensor(y)
        d = dim % tx.ndim
        shape = [*tx.shape]
        shape[d] *= 2
        want = torch.stack((tx, ty), dim=d + 1).reshape(shape).numpy()
        got = np.asarray(
            interleave(jnp.asarray(x), jnp.asarray(y), axis=dim))
        np.testing.assert_allclose(got, want)


def test_mplinear_plain_is_affine():
    pt.random.seed(0)
    lin = MPLinear(6, 4)
    x = jnp.asarray(np.random.RandomState(0).randn(3, 6), 'float32')
    want = x @ lin.weight.T + lin.bias
    np.testing.assert_allclose(
        np.asarray(lin(x)), np.asarray(want), atol=1e-6)


def test_mplinear_magnitude_preserving_matches_reference_math():
    from padertorch_tpu.contrib.mk.modules.utils import normalize
    pt.random.seed(1)
    lin = MPLinear(16, 8, magnitude_preserving=True)
    x = jnp.asarray(np.random.RandomState(1).randn(5, 16), 'float32')
    w = normalize(lin.weight) / math.sqrt(16)
    want = ((0.5 * x) @ w.T + 0.5 * lin.bias) / math.sqrt(2.0)
    np.testing.assert_allclose(
        np.asarray(lin(x)), np.asarray(want), atol=1e-6)
    # magnitude preservation: unit-variance input stays ~unit variance
    big = jnp.asarray(np.random.RandomState(2).randn(4096, 16), 'float32')
    lin_nb = MPLinear(16, 8, bias=False, magnitude_preserving=True)
    out_std = float(jnp.std(lin_nb(big)))
    assert 0.7 < out_std < 1.3, out_std


def test_mplinear_magnitude_preserving_chunks():
    from padertorch_tpu.contrib.mk.modules.utils import normalize
    pt.random.seed(2)
    lin = MPLinear(12, 6, bias=False, magnitude_preserving=True,
                   chunks=2)
    x = jnp.asarray(np.random.RandomState(3).randn(2, 12), 'float32')
    w = normalize(lin.weight, chunks=2) / math.sqrt(12)
    np.testing.assert_allclose(
        np.asarray(lin(x)), np.asarray(x @ w.T), atol=1e-6)
