"""Chunking transforms for training pipelines.

Reference parity: ``padertorch/contrib/neumann/chunking.py`` — ``Chunk``
(all chunks) and ``RandomChunkSingle`` (one random chunk per example).
"""
import numpy as np

from padertorch_tpu.data.dataset import FilterException
from padertorch_tpu.utils.misc import to_list

__all__ = ['Chunk', 'RandomChunkSingle']


class Chunk:
    """Cut all chunks of size ``chunk_size`` from the given keys.

    Returns a list of examples (use with ``dataset.map(...).unbatch()``
    semantics — here: map then flatten via ``.map(chunker)`` +
    ``FilterException`` handling).
    """

    def __init__(self, chunk_size, chunk_keys, axis=-1):
        self.chunk_size = chunk_size
        self.chunk_keys = to_list(chunk_keys)
        self.axis = axis

    def __call__(self, example):
        lengths = {
            key: np.asarray(example[key]).shape[self.axis]
            for key in self.chunk_keys
        }
        assert len(set(lengths.values())) == 1, lengths
        length = next(iter(lengths.values()))
        if length < self.chunk_size:
            raise FilterException()
        chunks = []
        for start in range(0, length - self.chunk_size + 1,
                           self.chunk_size):
            new = dict(example)
            for key in self.chunk_keys:
                arr = np.asarray(example[key])
                slc = [slice(None)] * arr.ndim
                slc[self.axis] = slice(start, start + self.chunk_size)
                new[key] = arr[tuple(slc)]
            new['chunk_start'] = start
            chunks.append(new)
        return chunks


class RandomChunkSingle:
    """Cut one random chunk per example. Reference: ``chunking.py:131``.

    >>> chunker = RandomChunkSingle(4, chunk_keys='x', rng=np.random.RandomState(0))
    >>> out = chunker({'x': np.arange(10), 'num_samples': 10})
    >>> out['x'].shape
    (4,)
    >>> out['num_samples']
    4
    """

    def __init__(self, chunk_size, chunk_keys, axis=-1, rng=np.random):
        self.chunk_size = chunk_size
        self.chunk_keys = to_list(chunk_keys)
        self.axis = axis
        self.rng = rng

    def __call__(self, example):
        lengths = {
            key: np.asarray(example[key]).shape[self.axis]
            for key in self.chunk_keys
        }
        assert len(set(lengths.values())) == 1, lengths
        length = next(iter(lengths.values()))
        if self.chunk_size == -1:
            return example
        if length < self.chunk_size:
            raise FilterException()
        start = int(self.rng.randint(0, length - self.chunk_size + 1)) \
            if length > self.chunk_size else 0
        new = dict(example)
        for key in self.chunk_keys:
            arr = np.asarray(example[key])
            slc = [slice(None)] * arr.ndim
            slc[self.axis] = slice(start, start + self.chunk_size)
            new[key] = arr[tuple(slc)]
        if 'num_samples' in new:
            new['num_samples'] = self.chunk_size
        new['chunk_start'] = start
        return new
