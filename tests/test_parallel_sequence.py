"""Ring attention (sequence parallelism) must equal exact full
attention computed on one device, incl. causal masks and gradients."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from padertorch_tpu.parallel.sequence import sequence_parallel_attention

N = 4  # sequence shards


def _mesh():
    devices = jax.devices()
    if len(devices) < N:
        pytest.skip(f'needs >= {N} devices')
    return Mesh(np.asarray(devices[:N]), ('seq',))


def _exact(q, k, v, causal=False):
    scale = 1.0 / np.sqrt(q.shape[-1])
    logits = jnp.einsum('bhqd,bhkd->bhqk', q, k) * scale
    if causal:
        t = q.shape[2]
        mask = jnp.arange(t)[None, :] > jnp.arange(t)[:, None]
        logits = jnp.where(mask[None, None],
                           jnp.finfo(jnp.float32).min, logits)
    w = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum('bhqk,bhkd->bhqd', w, v)


def _qkv(seed=0, b=2, h=2, t=16, d=8):
    rng = np.random.default_rng(seed)
    return tuple(
        jnp.asarray(rng.normal(size=(b, h, t, d)).astype('float32'))
        for _ in range(3))


def test_ring_attention_matches_exact():
    mesh = _mesh()
    q, k, v = _qkv()
    want = _exact(q, k, v)
    got = sequence_parallel_attention(q, k, v, mesh=mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_ring_attention_causal_matches_exact():
    mesh = _mesh()
    q, k, v = _qkv(seed=1)
    want = _exact(q, k, v, causal=True)
    got = sequence_parallel_attention(q, k, v, mesh=mesh, causal=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_ring_attention_gradients_match():
    mesh = _mesh()
    q, k, v = _qkv(seed=2)

    def ring_loss(q, k, v):
        return jnp.sum(sequence_parallel_attention(
            q, k, v, mesh=mesh, causal=True) ** 2)

    def exact_loss(q, k, v):
        return jnp.sum(_exact(q, k, v, causal=True) ** 2)

    got = jax.grad(ring_loss, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(exact_loss, argnums=(0, 1, 2))(q, k, v)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-4, atol=1e-5)


def test_ring_attention_jit_and_long_sequence():
    mesh = _mesh()
    q, k, v = _qkv(seed=3, t=64)
    fn = jax.jit(lambda q, k, v: sequence_parallel_attention(
        q, k, v, mesh=mesh))
    np.testing.assert_allclose(
        np.asarray(fn(q, k, v)), np.asarray(_exact(q, k, v)),
        rtol=1e-5, atol=1e-6)


def test_mk_attention_sequence_parallel_equals_dense():
    from padertorch_tpu import random as ptrandom
    from padertorch_tpu.contrib.mk.modules.transformer import (
        MultiheadAttention, TransformerEncoder)
    mesh = _mesh()
    ptrandom.seed(0)
    mha = MultiheadAttention(16, 4, use_rope=True).eval()
    x = jnp.asarray(np.random.default_rng(9).normal(
        size=(2, 16, 16)).astype('float32'))
    want = mha(x)
    mha.set_sequence_mesh(mesh)
    got = mha(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)
    # whole encoder with every layer sequence-parallel
    ptrandom.seed(1)
    enc = TransformerEncoder(
        d_model=16, num_layers=2, num_heads=4, input_size=8).eval()
    xin = jnp.asarray(np.random.default_rng(10).normal(
        size=(2, 16, 8)).astype('float32'))
    want = enc(xin)
    for layer in enc.layers:
        layer.self_attn.set_sequence_mesh(mesh)
    got = enc(xin)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_ring_attention_key_padding_matches_exact():
    mesh = _mesh()
    q, k, v = _qkv(seed=6, t=16)
    lens = jnp.asarray([10, 16])

    # dense reference with key padding
    scale = 1.0 / np.sqrt(q.shape[-1])
    logits = jnp.einsum('bhqd,bhkd->bhqk', q, k) * scale
    pad = jnp.arange(16)[None, :] >= lens[:, None]
    logits = jnp.where(pad[:, None, None, :],
                       jnp.finfo(jnp.float32).min, logits)
    want = jnp.einsum('bhqk,bhkd->bhqd',
                      jax.nn.softmax(logits, -1), v)

    got = sequence_parallel_attention(
        q, k, v, mesh=mesh, key_padding_lens=lens)
    # compare only valid query rows (padded-query outputs are
    # don't-care: dense gives uniform-softmax garbage, ring gives 0)
    for b, n in enumerate([10, 16]):
        np.testing.assert_allclose(
            np.asarray(got)[b, :, :n], np.asarray(want)[b, :, :n],
            rtol=1e-5, atol=1e-6)


def test_mk_attention_sequence_parallel_with_seq_len():
    from padertorch_tpu import random as ptrandom
    from padertorch_tpu.contrib.mk.modules.transformer import (
        MultiheadAttention)
    mesh = _mesh()
    ptrandom.seed(2)
    mha = MultiheadAttention(16, 4).eval()
    x = jnp.asarray(np.random.default_rng(11).normal(
        size=(2, 16, 16)).astype('float32'))
    lens = [12, 16]
    want = mha(x, key_padding_lens=lens)
    mha.set_sequence_mesh(mesh)
    got = mha(x, key_padding_lens=lens)
    for b, n in enumerate(lens):
        np.testing.assert_allclose(
            np.asarray(got)[b, :n], np.asarray(want)[b, :n],
            rtol=1e-4, atol=1e-5)
