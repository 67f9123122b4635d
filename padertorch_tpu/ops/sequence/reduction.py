"""Masked sequence reductions.

TPU-native replacement for the reference's PackedSequence reductions
(``padertorch/ops/sequence/reduction.py:34``): padded arrays + lengths
instead of packed data, so everything stays static-shaped for XLA.
"""
import jax.numpy as jnp

from padertorch_tpu.ops.sequence.mask import compute_mask

__all__ = ['sequence_reduction', 'masked_mean', 'masked_sum',
           'packed_batch_sizes_to_sequence_lengths']


def packed_batch_sizes_to_sequence_lengths(batch_sizes):
    """torch PackedSequence ``batch_sizes`` -> per-example lengths.

    Reference parity: ``ops/sequence/reduction.py`` — useful when
    importing torch-packed data: example ``b``'s length is the number
    of time steps whose batch size exceeds ``b``.

    >>> packed_batch_sizes_to_sequence_lengths([4, 4, 4, 2]).tolist()
    [4, 4, 3, 3]
    """
    import numpy as np
    batch_sizes = np.asarray(batch_sizes)
    return (np.arange(batch_sizes[0])[:, None]
            < batch_sizes[None, :]).sum(axis=-1)


def masked_sum(x, sequence_lengths, batch_axis=0, sequence_axis=1,
               keepdims=False):
    """Sum over the sequence axis counting only non-padded values.

    >>> import jax.numpy as jnp
    >>> x = jnp.ones((2, 4))
    >>> masked_sum(x, [2, 4]).tolist()
    [2.0, 4.0]
    """
    mask = compute_mask(x, sequence_lengths, batch_axis, sequence_axis)
    return jnp.sum(x * mask, axis=sequence_axis, keepdims=keepdims)


def masked_mean(x, sequence_lengths, batch_axis=0, sequence_axis=1,
                keepdims=False):
    """Mean over the sequence axis counting only non-padded values.

    >>> import jax.numpy as jnp
    >>> x = jnp.arange(8.).reshape(2, 4)
    >>> masked_mean(x, [2, 4]).tolist()
    [0.5, 5.5]
    """
    mask = compute_mask(x, sequence_lengths, batch_axis, sequence_axis)
    total = jnp.sum(x * mask, axis=sequence_axis, keepdims=keepdims)
    count = jnp.sum(mask, axis=sequence_axis, keepdims=keepdims)
    return total / jnp.maximum(count, 1)


def sequence_reduction(fn, x, sequence_lengths=None, batch_axis=0,
                       sequence_axis=1, keepdims=False):
    """Apply a masked reduction; ``fn`` in {jnp.sum, jnp.mean}-like.

    Reference parity: ``ops/sequence/reduction.py:34`` (there over
    PackedSequence).
    """
    if sequence_lengths is None:
        return fn(x, axis=sequence_axis, keepdims=keepdims)
    if fn in (jnp.mean, 'mean'):
        return masked_mean(
            x, sequence_lengths, batch_axis, sequence_axis, keepdims)
    if fn in (jnp.sum, 'sum'):
        return masked_sum(
            x, sequence_lengths, batch_axis, sequence_axis, keepdims)
    mask = compute_mask(x, sequence_lengths, batch_axis, sequence_axis)
    return fn(x * mask, axis=sequence_axis, keepdims=keepdims)
