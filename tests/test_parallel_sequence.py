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


def _exact(q, k, v, causal=False, window=None):
    scale = 1.0 / np.sqrt(q.shape[-1])
    logits = jnp.einsum('bhqd,bhkd->bhqk', q, k) * scale
    t = q.shape[2]
    if causal:
        mask = jnp.arange(t)[None, :] > jnp.arange(t)[:, None]
        logits = jnp.where(mask[None, None],
                           jnp.finfo(jnp.float32).min, logits)
    if window is not None:
        left, right = window
        diff = jnp.arange(t)[None, :] - jnp.arange(t)[:, None]
        outside = jnp.zeros_like(diff, bool)
        if left is not None:
            outside = outside | (diff < -left)
        if right is not None:
            outside = outside | (diff > right)
        logits = jnp.where(outside[None, None],
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


@pytest.mark.parametrize('window', [
    (3, 3),       # band within one hop each side
    (4, 0),       # exactly one block left, none right
    (7, 2),       # two hops left, one right
    (None, 3),    # unbounded left -> full-ring left reach
    (15, 15),     # band covers everything -> full-ring fallback
])
def test_ring_attention_window_matches_exact(window):
    # t=16 over 4 shards -> t_local=4: bands cross shard boundaries
    mesh = _mesh()
    q, k, v = _qkv(seed=7, t=16)
    want = _exact(q, k, v, window=window)
    got = sequence_parallel_attention(q, k, v, mesh=mesh, window=window)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_ring_attention_window_prunes_ring():
    # the banded path must communicate fewer K/V hops than the full
    # ring: count ppermutes * scan length in the jaxpr
    mesh = _mesh()
    q, k, v = _qkv(seed=8, t=16)

    def hops(window):
        jaxpr = jax.make_jaxpr(
            lambda q, k, v: sequence_parallel_attention(
                q, k, v, mesh=mesh, window=window))(q, k, v)
        total = 0
        def count(jaxpr, length=1):
            nonlocal total
            for eqn in jaxpr.eqns:
                if eqn.primitive.name == 'ppermute':
                    total += length
                for param in eqn.params.values():
                    # ClosedJaxpr has .jaxpr; shard_map holds a raw Jaxpr
                    inner = getattr(param, 'jaxpr', None)
                    if inner is None and hasattr(param, 'eqns'):
                        inner = param
                    if inner is not None:
                        count(
                            inner,
                            length * eqn.params.get('length', 1))
        count(jaxpr.jaxpr)
        return total
    # full ring: local block first, then N-1 permute-accumulate hops
    # (x2 for K and V — the old accumulate-then-permute body paid one
    # extra discarded ppermute pair); (3,3) band: 1 hop per side
    assert hops(None) == 2 * (N - 1)
    assert hops((3, 3)) == 4
    assert hops((4, 0)) == 2


def test_ring_attention_window_causal_and_padding():
    mesh = _mesh()
    q, k, v = _qkv(seed=9, t=16)
    lens = jnp.asarray([11, 16])
    want = _exact(q, k, v, causal=True, window=(6, None))
    got = sequence_parallel_attention(
        q, k, v, mesh=mesh, causal=True, window=(6, None))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)

    scale = 1.0 / np.sqrt(q.shape[-1])
    logits = jnp.einsum('bhqd,bhkd->bhqk', q, k) * scale
    neg = jnp.finfo(jnp.float32).min
    diff = jnp.arange(16)[None, :] - jnp.arange(16)[:, None]
    logits = jnp.where(((diff < -5) | (diff > 2))[None, None], neg,
                       logits)
    pad = jnp.arange(16)[None, :] >= lens[:, None]
    logits = jnp.where(pad[:, None, None, :], neg, logits)
    want = jnp.einsum('bhqk,bhkd->bhqd', jax.nn.softmax(logits, -1), v)
    got = sequence_parallel_attention(
        q, k, v, mesh=mesh, window=(5, 2), key_padding_lens=lens)
    for b, n in enumerate([11, 16]):
        np.testing.assert_allclose(
            np.asarray(got)[b, :, :n], np.asarray(want)[b, :, :n],
            rtol=1e-5, atol=1e-6)


def test_ring_attention_window_gradients_match():
    mesh = _mesh()
    q, k, v = _qkv(seed=10, t=16)

    def ring_loss(q, k, v):
        return jnp.sum(sequence_parallel_attention(
            q, k, v, mesh=mesh, window=(5, 2)) ** 2)

    def exact_loss(q, k, v):
        return jnp.sum(_exact(q, k, v, window=(5, 2)) ** 2)

    got = jax.grad(ring_loss, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(exact_loss, argnums=(0, 1, 2))(q, k, v)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-4, atol=1e-5)


def test_mk_attention_sequence_parallel_window():
    # Longformer-style band through the module path rides the pruned
    # ring instead of falling back to dense attention
    from padertorch_tpu import random as ptrandom
    from padertorch_tpu.contrib.mk.modules.transformer import (
        MultiheadAttention)
    mesh = _mesh()
    ptrandom.seed(3)
    mha = MultiheadAttention(16, 4).eval()
    x = jnp.asarray(np.random.default_rng(12).normal(
        size=(2, 16, 16)).astype('float32'))
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter('error')  # the fallback warns — fail then
        want = mha(x, attn_window=(3, 3))
        mha.set_sequence_mesh(mesh)
        got = mha(x, attn_window=(3, 3))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


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
