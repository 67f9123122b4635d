"""Host<->device transfer and batch sorting utilities.

Reference parity: ``padertorch/data/batch.py``.  On TPU the transfer is
``jax.device_put`` (async, overlapped with compute by the prefetcher in
``padertorch_tpu/data/prefetch.py``).
"""
import dataclasses
import operator

import numpy as np
import jax
import jax.numpy as jnp

from padertorch_tpu.utils.nested import nested_op

__all__ = ['example_to_device', 'example_to_numpy', 'Sorter']


def _is_arraylike(x):
    return isinstance(x, (np.ndarray, np.generic, jax.Array))


def example_to_device(example, device=None):
    """Recursively move numpy arrays of a nested example to a jax device.

    Reference parity: ``data/batch.py:16``.  ``device`` may be a
    ``jax.Device``, a ``jax.sharding.Sharding`` (for sharded multi-chip
    input), or None (default device).  Non-array leaves pass through.
    Strings/ints stay on host.
    """
    def convert(x):
        if _is_arraylike(x):
            if isinstance(x, np.ndarray) and x.dtype == object:
                return x
            return jax.device_put(x, device)
        return x

    return nested_op(convert, example)


def example_to_numpy(example, detach=False):
    """Recursively fetch device arrays of a nested example to numpy.

    Reference parity: ``data/batch.py:84``.
    """
    del detach

    def convert(x):
        if isinstance(x, jax.Array):
            return np.asarray(jax.device_get(x))
        return x

    return nested_op(convert, example)


class Sorter:
    """Sort a batch (list of examples) by a key, longest first.

    Reference parity: ``data/batch.py:134`` (there used so PackedSequence
    gets decreasing lengths; here useful so bucketing/padding is tight).

    >>> batch = [{'num_samples': 2}, {'num_samples': 5}, {'num_samples': 3}]
    >>> [e['num_samples'] for e in Sorter('num_samples')(batch)]
    [5, 3, 2]
    """

    def __init__(self, key='num_samples', reverse=True):
        if callable(key):
            self.key = key
        else:
            self.key = operator.itemgetter(key)
        self.reverse = reverse

    def __call__(self, examples):
        return tuple(sorted(examples, key=self.key, reverse=self.reverse))
