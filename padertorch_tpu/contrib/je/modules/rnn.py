"""Uniform-API sequence encoders: GRU / LSTM / TransformerEncoder.

Reference parity: ``padertorch/contrib/je/modules/rnn.py`` — all take
(B, T, F) + seq_len and return (B, T, H).
"""
from padertorch_tpu.base import Module
from padertorch_tpu.modules import recurrent

__all__ = ['GRU', 'LSTM', 'TransformerEncoder']


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
