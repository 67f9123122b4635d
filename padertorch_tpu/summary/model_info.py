"""Model size reporting. Reference parity: ``padertorch/summary/model_info.py``."""
from dataclasses import dataclass

import numpy as np
import jax

from padertorch_tpu.module import partition

__all__ = ['num_parameters', 'ModelParameterSize']


@dataclass(repr=False)
class ModelParameterSize:
    total_count: int = 0
    trainable_count: int = 0
    total_bytes: int = 0
    trainable_bytes: int = 0

    def __repr__(self):
        return (
            f'{type(self).__name__}('
            f'total_count={self.total_count}, '
            f'trainable_count={self.trainable_count}, '
            f'total_bytes={self.total_bytes}, '
            f'trainable_bytes={self.trainable_bytes})'
        )


def num_parameters(module) -> ModelParameterSize:
    """Count parameters; buffers count as non-trainable.

    >>> from padertorch_tpu import nn, random as ptrandom
    >>> ptrandom.seed(0)
    >>> num_parameters(nn.Linear(10, 10))
    ModelParameterSize(total_count=110, trainable_count=110, total_bytes=440, trainable_bytes=440)
    """
    result = ModelParameterSize()
    params, static = partition(module)
    for leaf in jax.tree_util.tree_leaves(params):
        size = int(np.prod(np.shape(leaf)))
        nbytes = np.dtype(leaf.dtype).itemsize
        result.trainable_count += size
        result.trainable_bytes += size * nbytes
        result.total_count += size
        result.total_bytes += size * nbytes
    for leaf in jax.tree_util.tree_leaves(static):
        if hasattr(leaf, 'dtype') and hasattr(leaf, 'shape'):
            size = int(np.prod(np.shape(leaf)))
            nbytes = np.dtype(leaf.dtype).itemsize
            result.total_count += size
            result.total_bytes += size * nbytes
    return result
