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
           'unpad_sequence']


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
