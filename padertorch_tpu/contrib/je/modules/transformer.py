"""Vanilla transformer with the je API surface.

Reference parity: ``padertorch/contrib/je/modules/transformer.py`` —
``scaled_dot_product_attention:12``, ``MultiHeadAttention:41``,
``TransformerLayer:91``, ``TransformerLayerStack:178``,
``get_causal_mask:259``.

TPU notes: attention is expressed as batched matmuls (ride the MXU);
masks are applied as additive ``log(mask)`` terms exactly like the
reference so padded/causal logits become ``-inf`` before the softmax.
Streaming ``state`` follows the reference semantics (keys/values are the
concatenation of the carried state and the new chunk).
"""
import math

import jax
import jax.numpy as jnp

from padertorch_tpu.base import Module
from padertorch_tpu import nn as ptnn
from padertorch_tpu.ops.mappings import ACTIVATION_FN_MAP
from padertorch_tpu.modules.normalization import Normalization
from padertorch_tpu.ops.sequence.mask import compute_mask

__all__ = [
    'scaled_dot_product_attention',
    'MultiHeadAttention',
    'TransformerLayer',
    'TransformerLayerStack',
    'get_causal_mask',
]


def get_causal_mask(x):
    """Lower-triangular mask aligned to the *last* key position
    (reference ``transformer.py:259``): with ``Tq != Tk`` the diagonal
    offset is ``Tk - Tq`` so each query attends to all keys up to and
    including its own position."""
    return jnp.tril(jnp.ones_like(x), k=x.shape[-1] - x.shape[-2])


def scaled_dot_product_attention(
        q, k, v, seq_len=None, bidirectional=False, mask=None):
    """Masked scaled dot-product attention (reference ``transformer.py:12``).

    Returns ``(output, attention_weights)``.

    >>> import numpy as np
    >>> q = jnp.zeros((2, 3, 4)); k = jnp.zeros((2, 6, 4))
    >>> v = jnp.asarray(np.random.RandomState(0).randn(2, 6, 8), 'float32')
    >>> x, _ = scaled_dot_product_attention(q, k, v, bidirectional=True)
    >>> x.shape
    (2, 3, 8)
    >>> q = jnp.zeros((2, 6, 4))
    >>> x, _ = scaled_dot_product_attention(q, k, v, bidirectional=False)
    >>> bool(jnp.all(x[0, 0] == v[0, 0]))
    True
    >>> bool(jnp.all(jnp.abs(x[0, -1] - v[0].mean(0)) < 1e-6))
    True
    """
    y = q @ jnp.swapaxes(k, -2, -1) / math.sqrt(k.shape[-1])
    if mask is not None:
        y = y + jnp.log((mask > 0).astype(y.dtype))
    if not bidirectional:
        causal = get_causal_mask(y)
        y = y + jnp.log((causal > 0).astype(y.dtype))
    elif seq_len is not None:
        mask = compute_mask(y, seq_len, batch_axis=0, sequence_axis=-1)
        y = y + jnp.log((mask > 0).astype(y.dtype))
    y = jax.nn.softmax(y, axis=-1)
    return y @ v, y


class MultiHeadAttention(Module):
    """Multi-head attention with separate q/k/v input sizes
    (reference ``transformer.py:41``; https://arxiv.org/abs/1706.03762).

    >>> import numpy as np
    >>> rs = np.random.RandomState(0)
    >>> q = jnp.asarray(rs.randn(2, 3, 4), 'float32')
    >>> k = jnp.asarray(rs.randn(2, 6, 6), 'float32')
    >>> v = jnp.asarray(rs.randn(2, 6, 8), 'float32')
    >>> attn = MultiHeadAttention(4, 6, 8, 4, 4, num_heads=2)
    >>> y, w = attn(q, k, v)
    >>> y.shape
    (2, 3, 4)
    """

    def __init__(
            self, queue_size, key_size, value_size, d_model, output_size,
            num_heads=8, bidirectional=False, use_flash=False,
    ):
        assert d_model % num_heads == 0, (d_model, num_heads)
        self.queue_size = queue_size
        self.d_model = d_model
        self.output_size = output_size
        self.num_heads = num_heads
        self.bidirectional = bidirectional
        # fused attention backend (ops/pallas/attention.py); flipped
        # tree-wide via mk.modules.transformer.set_attention_backend.
        # Applies when no explicit mask and (bidirectional or Tq == Tk
        # — je's causal mask is key-aligned, the kernel's is 0-aligned;
        # they only coincide for equal lengths). Attention weights are
        # not materialized on this path (returned as None).
        self.use_flash = use_flash
        self.lin_queue = ptnn.Linear(queue_size, d_model)
        self.lin_key = ptnn.Linear(key_size, d_model)
        self.lin_value = ptnn.Linear(value_size, d_model)
        self.out = ptnn.Linear(d_model, output_size)

    def forward(self, q, k, v, seq_len=None, mask=None):
        b, tq, _ = q.shape
        tk = k.shape[1]
        h, d = self.num_heads, self.d_model // self.num_heads
        q = self.lin_queue(q).reshape(b, tq, h, d).transpose(0, 2, 1, 3)
        k = self.lin_key(k).reshape(b, tk, h, d).transpose(0, 2, 1, 3)
        v = self.lin_value(v).reshape(b, tk, h, d).transpose(0, 2, 1, 3)
        use_flash = getattr(self, 'use_flash', False)
        if (use_flash and mask is None
                and (self.bidirectional or tq == tk)):
            from padertorch_tpu.ops.pallas.attention import (
                flash_attention, should_use_flash)
            # 'auto' consults the measured crossover; True forces the
            # kernel.  (Default stays False here: the dense branch also
            # returns the attention weights, which the kernel cannot.)
            if use_flash is True or should_use_flash(
                    tq, tk, causal=not self.bidirectional):
                # matches the dense branch: seq_len masks keys only in
                # the bidirectional case (the causal branch ignores it)
                lens = seq_len if self.bidirectional else None
                x = flash_attention(
                    q, k, v, causal=not self.bidirectional,
                    key_padding_lens=lens,
                    interpret=jax.default_backend() != 'tpu')
                x = x.transpose(0, 2, 1, 3).reshape(b, tq, self.d_model)
                return self.out(x), None
        x, attention_weights = scaled_dot_product_attention(
            q, k, v, seq_len=seq_len, bidirectional=self.bidirectional,
            mask=mask,
        )
        x = x.transpose(0, 2, 1, 3).reshape(b, tq, self.d_model)
        return self.out(x), attention_weights


class TransformerLayer(Module):
    """Self-attention (+ optional cross-attention) + feed-forward block
    with pre-/post-norm and residuals (reference ``transformer.py:91``)."""

    def __init__(
            self, d_model=512, d_ff=2048, num_heads=8,
            bidirectional=True, cross_attention=False,
            norm='layer', norm_kwargs=None, norm_first=True,
            activation_ff='relu', dropout=0.,
    ):
        self.multi_head_self_attention = MultiHeadAttention(
            d_model, d_model, d_model, d_model, d_model,
            num_heads=num_heads, bidirectional=bidirectional,
        )
        self.cross_attention = cross_attention
        self.hidden = ptnn.Linear(d_model, d_ff)
        self.out = ptnn.Linear(d_ff, d_model)

        if norm is None:
            self.self_attention_norm = None
            self.output_norm = None
            norm_kwargs = None
        else:
            norm_kwargs = {
                'data_format': 'btc',
                'shape': (None, None, d_model),
                'eps': 1e-2,
                **(norm_kwargs or {}),
            }
            if norm == 'batch':
                norm_kwargs['statistics_axis'] = 'bt'
            elif norm == 'layer':
                norm_kwargs['statistics_axis'] = 'c'
            else:
                raise ValueError(f'{norm} normalization not known.')
            self.self_attention_norm = Normalization(**norm_kwargs)
            self.output_norm = Normalization(**norm_kwargs)

        if cross_attention:
            self.multi_head_cross_attention = MultiHeadAttention(
                d_model, d_model, d_model, d_model, d_model,
                num_heads=num_heads, bidirectional=True,
            )
            self.cross_attention_norm = (
                None if norm is None else Normalization(**norm_kwargs))
        self.norm_first = norm_first
        self.activation_ff = ACTIVATION_FN_MAP[activation_ff]()
        self.dropout = ptnn.Dropout(dropout) if dropout > 0. else None

    def _drop(self, x):
        return x if self.dropout is None else self.dropout(x)

    def forward(self, x, seq_len, m=None, seq_len_m=None, state=None):
        if state is not None:
            assert self.multi_head_self_attention.bidirectional is False
        s = x if state is None else jnp.concatenate((state, x), axis=1)
        h, _ = self.multi_head_self_attention(x, s, s, seq_len=seq_len)
        h = self._drop(h)
        if self.self_attention_norm is not None and self.norm_first:
            h = self.self_attention_norm(h, sequence_lengths=seq_len)
        h = h + x
        if self.self_attention_norm is not None and not self.norm_first:
            h = self.self_attention_norm(h, sequence_lengths=seq_len)
        if self.cross_attention:
            assert m is not None
            q = h
            h, _ = self.multi_head_cross_attention(
                q, m, m, seq_len=seq_len_m)
            h = self._drop(h)
            if self.cross_attention_norm is not None and self.norm_first:
                h = self.cross_attention_norm(h, sequence_lengths=seq_len)
            h = h + q
            if self.cross_attention_norm is not None \
                    and not self.norm_first:
                h = self.cross_attention_norm(h, sequence_lengths=seq_len)
        y = self.out(self.activation_ff(self.hidden(h)))
        y = self._drop(y)
        if self.output_norm is not None and self.norm_first:
            y = self.output_norm(y, sequence_lengths=seq_len)
        y = y + h
        if self.output_norm is not None and not self.norm_first:
            y = self.output_norm(y, sequence_lengths=seq_len)
        return y, s


class TransformerLayerStack(Module):
    """Input projection + sinusoidal positional encoding + N transformer
    layers with streaming state (reference ``transformer.py:178``).

    >>> x = jnp.zeros((2, 3, 8))
    >>> attn = TransformerLayerStack(8, 6, 20, 2, 2, bidirectional=True)
    >>> attn(x, seq_len=[1, 2])[0].shape
    (2, 3, 6)
    >>> attn = TransformerLayerStack(8, 6, 20, 2, 2, bidirectional=False)
    >>> attn(x, seq_len=None)[0].shape
    (2, 3, 6)
    >>> y, state = attn(
    ...     x, seq_len=None,
    ...     state=[jnp.zeros((2, 5, 6)), jnp.zeros((2, 5, 6))])
    >>> y.shape, state[0].shape
    ((2, 3, 6), (2, 8, 6))
    """

    def __init__(
            self, input_size, hidden_size=512, d_ff=2048, num_heads=8,
            num_layers=6, bidirectional=False, cross_attention=False,
            norm='layer', norm_kwargs=None, norm_first=True,
            activation_ff='relu', dropout=0., positional_encoding=True,
    ):
        self.positional_encoding = positional_encoding
        self.num_layers = num_layers
        self.hidden_size = hidden_size
        self.lin = ptnn.Linear(input_size, hidden_size)
        self.transformer_layers = [
            TransformerLayer(
                hidden_size, d_ff, num_heads, bidirectional=bidirectional,
                cross_attention=cross_attention,
                norm=norm, norm_kwargs=norm_kwargs, norm_first=norm_first,
                activation_ff=activation_ff, dropout=dropout,
            )
            for _ in range(num_layers)
        ]

    def add_positional_encoding(self, x):
        """Interleaved cos/sin encodings added to ``x`` (ref
        ``transformer.py:237``; channel order cos_0, sin_0, cos_1, ...)."""
        b, t, d = x.shape
        assert d % 2 == 0, x.shape
        positions = jnp.arange(t)[:, None]
        dimensions = jnp.arange(d // 2)
        angles = positions / (10000 ** (2 * dimensions / d))
        encodings = jnp.stack(
            (jnp.cos(angles), jnp.sin(angles)), axis=-1).reshape(t, d)
        return x + encodings.astype(x.dtype)

    def forward(self, x, seq_len, m=None, seq_len_m=None, state=None):
        h = self.lin(x)
        if self.positional_encoding:
            h = self.add_positional_encoding(h)
        if state is None:
            state = len(self.transformer_layers) * [None]
        new_state = []
        for layer, layer_state in zip(self.transformer_layers, state):
            h, layer_state = layer(
                h, seq_len=seq_len, m=m, seq_len_m=seq_len_m,
                state=layer_state,
            )
            new_state.append(layer_state)
        return h, new_state
