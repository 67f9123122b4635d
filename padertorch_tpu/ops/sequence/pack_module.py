"""Padded-array replacements for PackedSequence conversions.

Reference parity: ``padertorch/ops/sequence/pack_module.py`` — the
reference converts between lists of variable-length tensors and
PackedSequence. On TPU the canonical representation is
``(padded_array, sequence_lengths)`` with static shapes; these helpers
convert between that and lists of arrays.
"""
import numpy as np
import jax.numpy as jnp

__all__ = ['pack_sequence', 'unpack_sequence', 'pad_sequence',
           'unpad_sequence', 'pack_sequence_include_channel',
           'unpack_sequence_include_channel_like']


def pack_sequence(sequences):
    """List of (T_i, ...) arrays -> (padded (B, T_max, ...), lengths).

    >>> padded, lens = pack_sequence([np.ones((3, 2)), np.ones((5, 2))])
    >>> padded.shape, lens.tolist()
    ((2, 5, 2), [3, 5])
    """
    lengths = np.asarray([s.shape[0] for s in sequences])
    t_max = int(lengths.max())
    padded = jnp.stack([
        jnp.pad(jnp.asarray(s),
                [(0, t_max - s.shape[0])] + [(0, 0)] * (s.ndim - 1))
        for s in sequences
    ])
    return padded, jnp.asarray(lengths)


def unpack_sequence(padded, sequence_lengths):
    """Inverse of :func:`pack_sequence`: list of (T_i, ...) arrays.

    >>> padded, lens = pack_sequence([np.ones((3, 2)), np.ones((5, 2))])
    >>> [x.shape for x in unpack_sequence(padded, lens)]
    [(3, 2), (5, 2)]
    """
    return [
        padded[i, :int(n)] for i, n in enumerate(np.asarray(
            sequence_lengths))
    ]


def pad_sequence(sequences, batch_first=True, padding_value=0.0):
    """torch.nn.utils.rnn.pad_sequence equivalent (batch-first only)."""
    assert batch_first, 'padded arrays here are always batch-first'
    padded, _ = pack_sequence(sequences)
    if padding_value != 0.0:
        raise NotImplementedError('padding_value != 0 not supported')
    return padded


unpad_sequence = unpack_sequence


def pack_sequence_include_channel(list_of_arrays):
    """Pack (C, T_i, ...) arrays by flattening channels into the batch.

    Reference parity: ``ops/sequence/pack_module.py:37`` — there the
    channels become extra PackedSequence rows; here they become extra
    rows of the padded batch, so the result feeds the same
    batch-of-sequences consumers (e.g. a batched RNN).

    >>> packed, lens = pack_sequence_include_channel(
    ...     [np.zeros([2, 4, 5]), np.ones([2, 3, 5])])
    >>> packed.shape, lens.tolist()
    ((4, 4, 5), [4, 4, 3, 3])
    """
    flat = [channel for arr in list_of_arrays for channel in arr]
    return pack_sequence(flat)


def unpack_sequence_include_channel_like(packed, like):
    """Inverse of :func:`pack_sequence_include_channel`; channel counts
    come from the ``like`` arrays (ref ``pack_module.py:117``).

    >>> xs = [np.zeros([2, 4, 5]), np.ones([2, 3, 5])]
    >>> packed, lens = pack_sequence_include_channel(xs)
    >>> [x.shape for x in unpack_sequence_include_channel_like(
    ...     (packed, lens), like=xs)]
    [(2, 4, 5), (2, 3, 5)]
    """
    assert isinstance(like, (tuple, list))
    padded, lengths = packed
    lengths = list(np.asarray(lengths))
    pieces = []
    index = 0
    for entry in like:
        channels = entry.shape[0]
        ls, lengths = lengths[:channels], lengths[channels:]
        assert len(set(int(l) for l in ls)) == 1, ls
        pieces.append(padded[index:index + channels, :int(ls[0])])
        index += channels
    return pieces
