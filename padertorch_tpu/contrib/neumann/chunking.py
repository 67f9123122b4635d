"""Chunking transforms for training pipelines.

Reference parity: ``padertorch/contrib/neumann/chunking.py`` — ``Chunk``
(all 50%-overlapped chunks, DPRNN-paper semantics, ``chunking.py:16``)
and ``RandomChunkSingle`` (one random chunk per example with
``min_length`` zero-padding, ``chunking.py:131``).
"""
import numpy as np

from padertorch_tpu.data.dataset import FilterException
from padertorch_tpu.utils.misc import to_list

__all__ = ['Chunk', 'RandomChunkSingle']


def _slice_on_axis(array, start, stop, axis):
    slc = [slice(None)] * array.ndim
    slc[axis] = slice(start, stop)
    return array[tuple(slc)]


class Chunk:
    """Cut ALL 50%-overlapped chunks of size ``chunk_size``.

    The original DPRNN-paper chunking (reference ``chunking.py:16``):
    chunks start every ``chunk_size // 2`` samples, only full-size
    chunks are kept (no zero-padding at the end), shorter examples
    raise ``FilterException``. Returns a list of examples;
    non-chunked keys are copied, ``num_samples`` is set to
    ``chunk_size``. ``chunk_size=-1`` disables chunking.

    >>> c = Chunk(chunk_size=32000, chunk_keys=('x', 'y'))
    >>> ex = {'x': np.arange(65000), 'y': np.arange(65000),
    ...       'num_samples': 65000, 'gender': 'm'}
    >>> chunked = c(ex)
    >>> len(chunked), chunked[0]['num_samples'], chunked[0]['gender']
    (3, 32000, 'm')
    >>> for entry in chunked:
    ...     print(entry['x'][[0, -1]])
    [    0 31999]
    [16000 47999]
    [32000 63999]
    >>> Chunk(chunk_size=-1, chunk_keys=('x', 'y'))(ex)[0] == ex
    True
    >>> [e['x'][[0, -1]].tolist()
    ...  for e in c({'x': np.arange(63999), 'y': np.arange(63999)})]
    [[0, 31999], [16000, 47999]]
    """

    def __init__(self, chunk_size, chunk_keys, axis=-1):
        self.chunk_size = chunk_size
        self.chunk_keys = to_list(chunk_keys)
        self.axis = axis

    def __call__(self, example):
        if self.chunk_size == -1:
            return [example]
        to_chunk = {k: np.asarray(example[k]) for k in self.chunk_keys}
        lengths = [v.shape[self.axis] for v in to_chunk.values()]
        assert lengths[1:] == lengths[:-1], (
            'The shapes along the chunk dimension of all entries to '
            f'chunk must be equal! chunk_keys: {self.chunk_keys} '
            f'lengths: {lengths}')
        length = lengths[0]
        if length < self.chunk_size:
            raise FilterException()
        chunks = []
        shift = self.chunk_size // 2
        for start in range(0, length - self.chunk_size + 1, shift):
            new = {k: v for k, v in example.items()
                   if k not in self.chunk_keys}
            for key, arr in to_chunk.items():
                new[key] = _slice_on_axis(
                    arr, start, start + self.chunk_size, self.axis)
            new['num_samples'] = self.chunk_size
            chunks.append(new)
        return chunks


class RandomChunkSingle:
    """Cut one random chunk per example. Reference: ``chunking.py:131``.

    Examples shorter than ``min_length`` are discarded; examples
    between ``min_length`` and ``chunk_size`` are zero-padded to
    ``chunk_size`` (reference's centered padding); ``chunk_size=-1``
    disables chunking.

    >>> chunker = RandomChunkSingle(4, chunk_keys='x',
    ...                             rng=np.random.RandomState(0))
    >>> out = chunker({'x': np.arange(10), 'num_samples': 10})
    >>> out['x'].shape, out['num_samples']
    ((4,), 4)
    >>> c = RandomChunkSingle(4, min_length=2, chunk_keys='x',
    ...                       rng=np.random.RandomState(0))
    >>> c({'x': np.arange(3) + 1})['x'].tolist()
    [1, 2, 3, 0]
    >>> c({'x': np.arange(2) + 1})['x'].tolist()
    [0, 1, 2, 0]
    >>> c({'x': np.arange(1) + 1})
    Traceback (most recent call last):
    ...
    padertorch_tpu.data.dataset.FilterException
    """

    def __init__(self, chunk_size, chunk_keys, axis=-1, min_length=None,
                 rng=np.random):
        assert chunk_size == -1 or chunk_size > 0, (
            f'Invalid chunk size: {chunk_size}')
        self.chunk_size = chunk_size
        self.chunk_keys = to_list(chunk_keys)
        self.axis = axis
        self.min_length = (chunk_size if min_length is None
                           else min_length)
        self.rng = rng

    def __call__(self, example):
        if self.chunk_size == -1:
            return example
        to_chunk = {k: np.asarray(example[k]) for k in self.chunk_keys}
        lengths = [v.shape[self.axis] for v in to_chunk.values()]
        assert lengths[1:] == lengths[:-1], (
            'The shapes along the chunk dimension of all entries to '
            f'chunk must be equal! {lengths}')
        length = lengths[0]

        if length < self.min_length:
            raise FilterException()
        elif length < self.chunk_size:
            # centered zero-padding (reference pad_axis widths:
            # [(d)//2, (d)//2 + 1], then slice [0:chunk_size])
            deficit = self.chunk_size - length
            pad = [(0, 0)] * next(iter(to_chunk.values())).ndim
            pad[self.axis] = (deficit // 2, deficit // 2 + 1)
            to_chunk = {
                k: np.pad(v, pad) for k, v in to_chunk.items()}
            start = 0
        else:
            start = (int(self.rng.randint(
                0, length - self.chunk_size + 1))
                if length > self.chunk_size else 0)

        new = {k: v for k, v in example.items()
               if k not in self.chunk_keys}
        for key, arr in to_chunk.items():
            new[key] = _slice_on_axis(
                arr, start, start + self.chunk_size, self.axis).copy()
        new['num_samples'] = self.chunk_size
        return new
