"""je transformer tests mirroring the reference doctests plus
streaming/masking equivalence checks
(``padertorch/contrib/je/modules/transformer.py``)."""
import numpy as np
import jax
import jax.numpy as jnp

import padertorch_tpu as pt
from padertorch_tpu.module import partition, combine
from padertorch_tpu.contrib.je.modules.transformer import (
    scaled_dot_product_attention,
    MultiHeadAttention,
    TransformerLayer,
    TransformerLayerStack,
    get_causal_mask,
)
from padertorch_tpu.contrib.je.modules.rnn import RNN, GRU, reverse_sequence
from padertorch_tpu.contrib.je.modules.conv import CNN1d


def test_sdpa_causal_semantics():
    rs = np.random.RandomState(0)
    q = jnp.zeros((2, 6, 4))
    k = jnp.zeros((2, 6, 4))
    v = jnp.asarray(rs.randn(2, 6, 8), 'float32')
    x, w = scaled_dot_product_attention(q, k, v, bidirectional=False)
    # first query sees only the first key; last sees uniform average
    np.testing.assert_allclose(np.asarray(x[0, 0]), np.asarray(v[0, 0]),
                               atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(x[0, -1]), np.asarray(v[0].mean(0)), atol=1e-6)
    # weights are row-normalized and lower-triangular
    np.testing.assert_allclose(np.asarray(w.sum(-1)), 1.0, atol=1e-6)
    assert np.all(np.triu(np.asarray(w[0]), k=1) == 0)


def test_sdpa_seq_len_masks_padded_keys():
    rs = np.random.RandomState(1)
    q = jnp.asarray(rs.randn(2, 3, 4), 'float32')
    k = jnp.asarray(rs.randn(2, 6, 4), 'float32')
    v = jnp.asarray(rs.randn(2, 6, 8), 'float32')
    x1, _ = scaled_dot_product_attention(
        q, k, v, seq_len=[4, 6], bidirectional=True)
    # perturbing keys/values beyond seq_len must not change the output
    k2 = k.at[0, 4:].set(99.0)
    v2 = v.at[0, 4:].set(-99.0)
    x2, _ = scaled_dot_product_attention(
        q, k2, v2, seq_len=[4, 6], bidirectional=True)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), atol=1e-6)


def test_causal_mask_offset_for_state():
    # Tq=2 new frames against Tk=5 (3 carried + 2 new): row i attends
    # keys [0, 3+i]
    m = get_causal_mask(jnp.ones((2, 5)))
    assert m.tolist() == [[1, 1, 1, 1, 0], [1, 1, 1, 1, 1]]


def test_multi_head_attention_shapes_and_grad():
    pt.random.seed(0)
    rs = np.random.RandomState(2)
    attn = MultiHeadAttention(4, 6, 8, 8, 5, num_heads=2,
                              bidirectional=True)
    q = jnp.asarray(rs.randn(2, 3, 4), 'float32')
    k = jnp.asarray(rs.randn(2, 6, 6), 'float32')
    v = jnp.asarray(rs.randn(2, 6, 8), 'float32')
    y, w = attn(q, k, v, seq_len=[6, 4])
    assert y.shape == (2, 3, 5), y.shape
    assert w.shape == (2, 2, 3, 6), w.shape

    params, static = partition(attn)

    def loss(params):
        out, _ = combine(params, static)(q, k, v, seq_len=[6, 4])
        return jnp.sum(out ** 2)

    grads = jax.grad(loss)(params)
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(g)) for g in flat)
    assert any(np.abs(g).max() > 0 for g in flat)


def test_transformer_stack_shapes():
    pt.random.seed(1)
    x = jnp.zeros((2, 3, 8))
    attn = TransformerLayerStack(8, 6, 20, 2, 2, bidirectional=True)
    y, state = attn(x, seq_len=[1, 2])
    assert y.shape == (2, 3, 6), y.shape
    assert len(state) == 2 and state[0].shape == (2, 3, 6)


def test_transformer_streaming_state_matches_full_causal():
    """Chunked causal inference with carried state must equal the
    one-shot causal run (positional encoding off: the reference encodes
    chunk-local positions, so only the PE-free graph is streamable)."""
    pt.random.seed(2)
    rs = np.random.RandomState(3)
    stack = TransformerLayerStack(
        4, 8, 16, 2, 2, bidirectional=False, positional_encoding=False)
    x = jnp.asarray(rs.randn(1, 8, 4), 'float32')
    full, _ = stack(x, seq_len=None)
    y1, state = stack(x[:, :4], seq_len=None)
    y2, state = stack(x[:, 4:], seq_len=None, state=state)
    chunked = jnp.concatenate([y1, y2], axis=1)
    np.testing.assert_allclose(
        np.asarray(full), np.asarray(chunked), atol=1e-5)
    assert state[0].shape == (1, 8, 8)


def test_transformer_layer_cross_attention():
    pt.random.seed(3)
    rs = np.random.RandomState(4)
    layer = TransformerLayer(
        d_model=8, d_ff=16, num_heads=2, bidirectional=True,
        cross_attention=True)
    x = jnp.asarray(rs.randn(2, 5, 8), 'float32')
    memory = jnp.asarray(rs.randn(2, 7, 8), 'float32')
    y, s = layer(x, seq_len=[5, 3], m=memory, seq_len_m=[7, 6])
    assert y.shape == (2, 5, 8)
    # padded memory frames must not leak in
    m2 = memory.at[1, 6:].set(123.0)
    y2, _ = layer(x, seq_len=[5, 3], m=m2, seq_len_m=[7, 6])
    np.testing.assert_allclose(np.asarray(y), np.asarray(y2), atol=1e-5)


def test_transformer_stack_jit_partition_combine():
    pt.random.seed(4)
    stack = TransformerLayerStack(8, 6, 12, 2, 2, bidirectional=True)
    params, static = partition(stack)

    @jax.jit
    def fwd(params, x):
        y, _ = combine(params, static)(x, seq_len=None)
        return y

    y = fwd(params, jnp.ones((2, 5, 8)))
    assert y.shape == (2, 5, 6)


def test_reverse_sequence_roundtrip():
    rs = np.random.RandomState(5)
    x = jnp.asarray(rs.randn(3, 7, 2), 'float32')
    seq_len = [7, 4, 1]
    r = reverse_sequence(x, seq_len)
    rr = reverse_sequence(r, seq_len)
    mask = np.zeros((3, 7, 1), 'float32')
    for i, l in enumerate(seq_len):
        mask[i, :l] = 1
    np.testing.assert_allclose(
        np.asarray(rr), np.asarray(x) * mask, atol=1e-6)
    # within-length content is the exact flip
    np.testing.assert_allclose(
        np.asarray(r[1, :4]), np.asarray(x[1, :4][::-1]), atol=1e-6)
    # no seq_len -> plain flip
    np.testing.assert_allclose(
        np.asarray(reverse_sequence(x)), np.asarray(x)[:, ::-1], atol=1e-6)


def test_rnn_wrapper_channels_first_with_output_net():
    pt.random.seed(5)
    rs = np.random.RandomState(6)
    rnn = RNN(
        GRU(5, 8),
        output_net=CNN1d(in_channels=8, out_channels=[6], kernel_size=3),
    )
    x = jnp.asarray(rs.randn(2, 5, 10), 'float32')  # (B, F, T)
    y, seq_len = rnn(x, [10, 7])
    assert y.shape == (2, 6, 10), y.shape

    # reverse=True equals manually reversing in/out around the encoder
    fwd = RNN(GRU(5, 8))
    rev = RNN(fwd.rnn, reverse=True)
    y_rev, _ = rev(x, [10, 7])
    xr = reverse_sequence(jnp.swapaxes(x, 1, 2), [10, 7])
    manual = reverse_sequence(fwd.rnn(xr, [10, 7]), [10, 7])
    np.testing.assert_allclose(
        np.asarray(y_rev), np.asarray(jnp.swapaxes(manual, 1, 2)),
        atol=1e-6)


def test_rnn_wrapper_accepts_transformer_stack():
    pt.random.seed(6)
    stack = TransformerLayerStack(5, 6, 12, 2, 1, bidirectional=True)
    rnn = RNN(stack)
    y, seq_len = rnn(jnp.ones((2, 5, 9)), [9, 4])
    assert y.shape == (2, 6, 9), y.shape
