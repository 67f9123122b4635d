"""Dual-Path RNN: chunked two-scale sequence modeling.

Reference parity: ``padertorch/modules/dual_path_rnn.py`` — ``segment``
(zero-pad + fold to B x N x K x S), ``overlap_add``, ``_ChunkRNN`` (RNN +
FC + LayerNorm along the intra- or inter-chunk axis), ``DPRNNBlock``,
``DPRNN``.  Luo et al., "Dual-path RNN: efficient long sequence modeling
for time-domain single-channel speech separation".

TPU notes: segmentation is a static gather and overlap-add a scatter-add —
both fully shape-static for XLA.  The chunk RNNs batch all chunks into the
batch axis, so the MXU sees large (B*S, K, N) matmuls.
"""
import math

import jax
import jax.numpy as jnp

from padertorch_tpu.module import Module
from padertorch_tpu import nn
from padertorch_tpu.modules.recurrent import LSTM, GRU

__all__ = ['segment', 'overlap_add', 'DPRNN', 'DPRNNBlock',
           'apply_examplewise', 'pack', 'unpack']


def pack(x, sequence_lengths):
    """Concatenate the valid prefixes of each example, dropping padding
    (reference ``modules/dual_path_rnn.py:214``).  Inverse: :func:`unpack`.

    Host-side utility (the output length is data-dependent, so it cannot
    run under jit) — inside a jitted step use masks instead.

    >>> a = jnp.ones((2, 4, 3))
    >>> pack(a, [2, 4]).shape
    (6, 3)
    """
    assert len(sequence_lengths) == len(x), (len(sequence_lengths), len(x))
    return jnp.concatenate([
        x_[:int(l)] for x_, l in zip(x, sequence_lengths)])


def unpack(x, sequence_lengths):
    """Inverse of :func:`pack`: re-pad to ``(B, T_max, ...)`` with zeros.

    >>> a = jnp.arange(6.).reshape(6, 1)
    >>> unpack(pack(unpack(a[:3], [3]), [3]), [3]).shape
    (1, 3, 1)
    >>> r = unpack(jnp.ones((5, 2)), [2, 3])
    >>> r.shape, float(r[0, 2].sum())
    ((2, 3, 2), 0.0)
    """
    sequence_lengths = [int(l) for l in sequence_lengths]
    t_max = max(sequence_lengths)
    segments = []
    start = 0
    for l in sequence_lengths:
        seg = x[start:start + l]
        pad = [(0, t_max - l)] + [(0, 0)] * (x.ndim - 1)
        segments.append(jnp.pad(seg, pad))
        start += l
    return jnp.stack(segments)


def apply_examplewise(fn, x, sequence_lengths, time_axis=1):
    """Apply ``fn`` per example, restricted to the valid time range.

    Reference parity: ``modules/dual_path_rnn.py:258`` — for fns whose
    output depends on the input's statistics (e.g. norms), masking is
    not enough: each example is sliced to its true length, processed
    with a singleton batch axis, and written back; padding stays zero.
    Host-side utility (python loop, dynamic slices) — not for use
    inside jit.
    """
    import jax.numpy as jnp
    if sequence_lengths is None:
        return fn(x)
    assert time_axis != 0, 'The first axis must be the batch axis!'
    assert len(sequence_lengths) == x.shape[0], (
        len(sequence_lengths), x.shape)
    time_axis = time_axis % x.ndim
    out = jnp.zeros_like(x)
    selector = (slice(None),) * (time_axis - 1)
    for b, l in enumerate(sequence_lengths):
        s = (b, *selector, slice(int(l)))
        out = out.at[s].set(fn(x[s][None, ...])[0])
    return out


def segment(signal, hop_size, window_size, sequence_lengths=None):
    """Zero-pad and fold (B, L, N) into (B, N, K, S) chunks.

    Padding: ``hop_size`` zeros at the front, and at the back enough zeros
    that the last window is complete (>= hop_size).

    >>> import jax.numpy as jnp
    >>> segmented, _ = segment(jnp.ones((1, 50, 3)), 10, 20)
    >>> segmented.shape  # B x N x K x S
    (1, 3, 20, 6)
    >>> float(jnp.sum(jnp.abs(segmented[..., :10, 0])))  # front zero-padded
    0.0
    >>> seg, lens = segment(jnp.ones((1, 50, 3)), 10, 20,
    ...                     sequence_lengths=jnp.array([30]))
    >>> lens.tolist()
    [4]
    """
    b, l, n = signal.shape
    if sequence_lengths is not None:
        sequence_lengths = jnp.asarray(sequence_lengths)
        # zero out the padded part so chunks beyond the length stay zero
        mask = (jnp.arange(l)[None, :] < sequence_lengths[:, None])
        signal = signal * mask[..., None].astype(signal.dtype)
    # front pad
    front = hop_size
    # pad back so that (front + L + back - window) % hop == 0 and last
    # window is fully inside, with at least hop_size zeros at the end
    total = front + l + hop_size
    remainder = (total - window_size) % hop_size
    back = hop_size + (hop_size - remainder if remainder else 0)
    x = jnp.pad(signal, ((0, 0), (front, back), (0, 0)))
    s = (x.shape[1] - window_size) // hop_size + 1
    idx = (jnp.arange(s)[:, None] * hop_size
           + jnp.arange(window_size)[None, :])  # (S, K)
    chunks = x[:, idx, :]  # (B, S, K, N)
    out = jnp.transpose(chunks, (0, 3, 2, 1))  # (B, N, K, S)
    if sequence_lengths is not None:
        chunk_lengths = (
            (sequence_lengths + hop_size - 1) // hop_size + 1)
        return out, chunk_lengths
    return out, None


def overlap_add(signal, hop_size, unpad=True):
    """Inverse of :func:`segment`: (B, N, K, S) -> (B, L, N).

    >>> import jax.numpy as jnp
    >>> a = jnp.arange(50.)[None, :, None]
    >>> segmented, _ = segment(a, 10, 20)
    >>> added = overlap_add(segmented, 10, unpad=True)
    >>> added.shape
    (1, 50, 1)
    >>> added[0, :3, 0].tolist()  # 2x overlap doubles the values
    [0.0, 2.0, 4.0]
    """
    b, n, k, s = signal.shape
    length = (s - 1) * hop_size + k
    chunks = jnp.transpose(signal, (0, 3, 2, 1))  # (B, S, K, N)
    idx = (jnp.arange(s)[:, None] * hop_size
           + jnp.arange(k)[None, :])  # (S, K)
    out = jnp.zeros((b, length, n), signal.dtype)
    out = out.at[:, idx.reshape(-1), :].add(
        chunks.reshape(b, s * k, n))
    if unpad:
        out = out[:, hop_size:length - hop_size]
    return out


class _ChunkRNN(Module):
    """RNN + FC + LayerNorm along the intra- or inter-chunk axis.

    ``chunk_axis='k'`` (intra) batches the segment axis S into the batch;
    ``chunk_axis='s'`` (inter) batches the within-chunk axis K.
    Reference parity: ``dual_path_rnn.py:284`` (there via einops strings
    '(b s) k n' / '(b k) s n').
    """

    def __init__(self, feat_size, rnn_size, chunk_axis, rnn_type='blstm'):
        assert chunk_axis in ('k', 's'), chunk_axis
        self.chunk_axis = chunk_axis
        self.rnn_type = rnn_type
        if rnn_type in ('lstm', 'blstm'):
            self.rnn = LSTM(feat_size, rnn_size,
                            bidirectional=rnn_type == 'blstm')
        elif rnn_type in ('gru', 'bgru'):
            self.rnn = GRU(feat_size, rnn_size,
                           bidirectional=rnn_type == 'bgru')
        elif rnn_type == 'cnn':
            self.rnn = nn.Conv1d(feat_size, rnn_size, 3, padding=1)
        else:
            raise ValueError(f'Unknown rnn_type for chunk RNN: {rnn_type}')
        out_size = 2 * rnn_size if rnn_type in ('blstm', 'bgru') \
            else rnn_size
        self.fc = nn.Linear(out_size, feat_size)
        self.norm = nn.LayerNorm((feat_size,))
        self.feat_size = feat_size

    def forward(self, sequence, sequence_lengths=None):
        """sequence: (B, N, K, S); lengths along S."""
        b, n, k, s = sequence.shape
        if self.chunk_axis == 'k':
            # intra-chunk: iterate over k, batch (b, s)
            x = jnp.transpose(sequence, (0, 3, 2, 1))  # (B, S, K, N)
            x = x.reshape(b * s, k, n)
            y = self._run(x, None)
            y = y.reshape(b, s, k, self.feat_size)
            out = jnp.transpose(y, (0, 3, 2, 1))
        else:
            # inter-chunk: iterate over s, batch (b, k)
            x = jnp.transpose(sequence, (0, 2, 3, 1))  # (B, K, S, N)
            x = x.reshape(b * k, s, n)
            lens = None
            if sequence_lengths is not None:
                lens = jnp.repeat(jnp.asarray(sequence_lengths), k)
            y = self._run(x, lens)
            y = y.reshape(b, k, s, self.feat_size)
            out = jnp.transpose(y, (0, 3, 1, 2))
        if sequence_lengths is not None:
            mask = (jnp.arange(s)[None, :]
                    < jnp.asarray(sequence_lengths)[:, None])
            out = out * mask[:, None, None, :].astype(out.dtype)
        return out

    def _run(self, x, lens):
        if self.rnn_type == 'cnn':
            h = jnp.swapaxes(x, 1, 2)
            h = self.rnn(h)
            h = jnp.swapaxes(h, 1, 2)
        else:
            h, _ = self.rnn(x, seq_lens=lens)
        return self.norm(self.fc(h))


class DPRNNBlock(Module):
    """Intra-chunk RNN + residual, then inter-chunk RNN + residual.

    Reference parity: ``dual_path_rnn.py:510``.
    """

    def __init__(self, feat_size, rnn_size, inter_chunk_type='blstm',
                 intra_chunk_type='blstm'):
        self.intra_chunk_rnn = _ChunkRNN(
            feat_size, rnn_size, chunk_axis='k',
            rnn_type=intra_chunk_type)
        self.inter_chunk_rnn = _ChunkRNN(
            feat_size, rnn_size, chunk_axis='s',
            rnn_type=inter_chunk_type)

    def forward(self, sequence, sequence_lengths=None):
        sequence = sequence + self.intra_chunk_rnn(
            sequence, sequence_lengths)
        sequence = sequence + self.inter_chunk_rnn(
            sequence, sequence_lengths)
        return sequence


class DPRNN(Module):
    """The Dual-Path RNN (not the separator). Reference: ``dual_path_rnn.py:550``.

    >>> from padertorch_tpu import random as ptrandom
    >>> ptrandom.seed(0)
    >>> import jax.numpy as jnp
    >>> dprnn = DPRNN(16, 8, window_length=10, hop_size=5, num_blocks=2)
    >>> dprnn(jnp.ones((2, 30, 16))).shape
    (2, 30, 16)
    """

    def __init__(self, input_size, rnn_size, window_length, hop_size,
                 num_blocks, inter_chunk_type='blstm',
                 intra_chunk_type='blstm'):
        self.window_size = window_length
        self.hop_size = hop_size
        self.input_size = self.hidden_size = input_size
        self.dprnn_blocks = [
            DPRNNBlock(
                feat_size=input_size,
                rnn_size=rnn_size,
                inter_chunk_type=inter_chunk_type,
                intra_chunk_type=intra_chunk_type,
            ) for _ in range(num_blocks)
        ]

    def calculate_window_and_hop_size(self, sequence,
                                      sequence_lengths=None):
        """'auto': K ~ sqrt(2L) heuristic from the DPRNN paper, Sec 2.2."""
        if self.window_size == 'auto' or self.hop_size == 'auto':
            assert self.window_size == self.hop_size == 'auto'
            window_size = int(math.sqrt(2 * sequence.shape[-2]))
            hop_size = window_size // 2
            return window_size, hop_size
        return self.window_size, self.hop_size

    def forward(self, sequence, sequence_lengths=None):
        """(B, L, N) -> (B, L, N)."""
        window_size, hop_size = self.calculate_window_and_hop_size(
            sequence, sequence_lengths)
        segmented, chunk_lengths = segment(
            sequence, hop_size=hop_size, window_size=window_size,
            sequence_lengths=sequence_lengths)
        h = segmented
        for block in self.dprnn_blocks:
            h = block(h, chunk_lengths)
        out = overlap_add(h, hop_size=hop_size, unpad=True)
        return out[:, :sequence.shape[1]]
