"""Uniform-API sequence encoders: GRU / LSTM / TransformerEncoder.

Reference parity: ``padertorch/contrib/je/modules/rnn.py`` — all take
(B, T, F) + seq_len and return (B, T, H).  The channels-first
``RNN`` wrapper (``rnn.py:10``: optional sequence reversal + CNN1d
output net, returns ``(x, seq_len)`` with x in (B, F, T)) and
``reverse_sequence`` (``rnn.py:130``) are provided on top.
"""
import jax.numpy as jnp

from padertorch_tpu.base import Module
from padertorch_tpu.modules import recurrent
from padertorch_tpu.ops.sequence.mask import compute_mask

__all__ = ['RNN', 'GRU', 'LSTM', 'TransformerEncoder', 'reverse_sequence']


def reverse_sequence(x, seq_len=None):
    """Reverse each sequence within its length, keeping padding at the
    end (reference ``rnn.py:130``); time is axis 1.

    Vectorized as one gather (index ``(seq_len - 1 - t) mod T``) instead
    of the reference's per-example python loop — jit/TPU friendly.

    >>> import numpy as np
    >>> x = jnp.cumsum(jnp.ones((1, 4, 1)), axis=1)
    >>> reverse_sequence(x, [3])[0, :, 0].tolist()
    [3.0, 2.0, 1.0, 0.0]
    >>> r = reverse_sequence(reverse_sequence(x, [3]), [3])
    >>> r[0, :, 0].tolist()
    [1.0, 2.0, 3.0, 0.0]
    """
    if seq_len is None:
        return jnp.flip(x, axis=1)
    t_max = x.shape[1]
    seq_len = jnp.asarray(seq_len)
    idx = (seq_len[:, None] - 1 - jnp.arange(t_max)[None, :]) % t_max
    idx = idx.reshape(idx.shape + (1,) * (x.ndim - 2))
    out = jnp.take_along_axis(x, idx, axis=1)
    mask = compute_mask(out, seq_len, batch_axis=0, sequence_axis=1)
    return out * mask


class RNN(Module):
    """Channels-first wrapper: (B, F, T) -> (B, H, T), returns
    ``(x, seq_len)`` (reference ``rnn.py:10``).

    ``rnn`` is any (B, T, F)-API encoder from this module (or a
    ``TransformerLayerStack``); ``output_net`` is typically a ``CNN1d``;
    ``reverse=True`` runs the encoder over the reversed sequences.
    """

    def __init__(self, rnn, output_net=None, reverse=False):
        self.rnn = rnn
        self.output_net = output_net
        self.reverse = reverse

    def forward(self, x, seq_len=None):
        if self.rnn is not None:
            x = jnp.swapaxes(x, 1, 2)  # (B, T, F)
            if self.reverse:
                x = reverse_sequence(x, seq_len=seq_len)
            out = self.rnn(x, seq_len)
            x = out[0] if isinstance(out, tuple) else out
            if self.reverse:
                x = reverse_sequence(x, seq_len=seq_len)
            x = jnp.swapaxes(x, 1, 2)  # (B, H, T)
        if self.output_net is not None:
            x, seq_len = self.output_net(x, seq_len)
        return x, seq_len


class _RNNWrap(Module):
    rnn_cls = None

    def __init__(self, input_size, hidden_size, num_layers=1,
                 bidirectional=False, dropout=0.0):
        self.rnn = self.rnn_cls(
            input_size, hidden_size, num_layers=num_layers,
            bidirectional=bidirectional, dropout=dropout)
        self.hidden_size = hidden_size * (2 if bidirectional else 1)

    def forward(self, x, seq_len=None):
        out, _ = self.rnn(x, seq_lens=seq_len)
        return out


class GRU(_RNNWrap):
    rnn_cls = recurrent.GRU


class LSTM(_RNNWrap):
    rnn_cls = recurrent.LSTM


class TransformerEncoder(Module):
    """Thin wrapper around the mk transformer encoder with the rnn API."""

    def __init__(self, input_size, hidden_size, num_layers=2, num_heads=4,
                 dropout=0.0):
        from padertorch_tpu.contrib.mk.modules.transformer import (
            TransformerEncoder as MkEncoder,
        )
        self.encoder = MkEncoder(
            d_model=hidden_size, num_layers=num_layers,
            num_heads=num_heads, dropout=dropout, input_size=input_size)
        self.hidden_size = hidden_size

    def forward(self, x, seq_len=None):
        return self.encoder(x, seq_len=seq_len)
