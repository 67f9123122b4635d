"""Sequence padding masks — the TPU replacement for PackedSequence.

Reference parity: ``padertorch/ops/sequence/mask.py:4``.
"""
import jax.numpy as jnp
import numpy as np

__all__ = ['compute_mask']


def compute_mask(x, sequence_lengths, batch_axis=0, sequence_axis=1):
    """Mask of ones at non-padded positions, broadcast to ``x.shape``.

    >>> import jax.numpy as jnp
    >>> x = 2 * jnp.ones((3, 1, 10, 4))
    >>> mask = compute_mask(x, [1, 2, 3], batch_axis=0, sequence_axis=-1)
    >>> mask.shape
    (3, 1, 10, 4)
    >>> mask[:, 0, 0].tolist()
    [[1.0, 0.0, 0.0, 0.0], [1.0, 1.0, 0.0, 0.0], [1.0, 1.0, 1.0, 0.0]]

    Args:
        x: array to be masked.
        sequence_lengths: per-sequence lengths (list/array), or None for an
            all-ones mask.
        batch_axis: axis along which sequences are stacked.
        sequence_axis: axis that contains padding.
    """
    if sequence_lengths is None:
        return jnp.ones_like(x)
    ndim = x.ndim
    batch_axis = batch_axis % ndim
    sequence_axis = sequence_axis % ndim
    lengths = jnp.asarray(sequence_lengths)
    # lengths indexed along batch_axis, broadcast over all later axes
    shape_l = [1] * ndim
    shape_l[batch_axis] = -1
    lengths = lengths.reshape(shape_l)
    idx = jnp.arange(x.shape[sequence_axis])
    shape_i = [1] * ndim
    shape_i[sequence_axis] = -1
    idx = idx.reshape(shape_i)
    mask = (idx < lengths).astype(x.dtype)
    return jnp.broadcast_to(mask, x.shape)
