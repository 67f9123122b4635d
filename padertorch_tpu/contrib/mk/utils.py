"""Receptive-field arithmetic for 1D CNN stacks.

Reference parity: ``padertorch/contrib/mk/utils.py``
(``compute_receptive_field_1d``; recursion from
https://distill.pub/2019/computing-receptive-fields).
"""
import typing as tp

import numpy as np

from padertorch_tpu.utils.misc import to_list
from padertorch_tpu.contrib.je.modules.conv import compute_pad_size

__all__ = ['compute_receptive_field_1d']


def compute_receptive_field_1d(
    kernel_sizes, *,
    dilations: tp.Union[int, tp.List[int]] = 1,
    strides: tp.Union[int, tp.List[int]] = 1,
    pad_types='both',
    pool_sizes=1,
    pool_strides=1,
    center_index=None,
):
    """Receptive field size per layer of a 1D CNN (deepest first).

    With ``center_index`` also returns the index in the input where the
    receptive field of that output position starts.

    >>> compute_receptive_field_1d([3, 3, 3])
    [7, 5, 3]
    >>> compute_receptive_field_1d([3, 3], strides=2)
    [7, 3]
    >>> compute_receptive_field_1d([3], dilations=2)
    [5]
    >>> compute_receptive_field_1d([3, 3], center_index=0)
    ([5, 3], np.int64(-2))
    """
    kernel_sizes = list(kernel_sizes)
    dilations = to_list(dilations, len(kernel_sizes))
    strides = to_list(strides, len(kernel_sizes))
    pad_types = to_list(pad_types, len(kernel_sizes))
    pool_sizes = to_list(pool_sizes, len(kernel_sizes))
    pool_strides = to_list(pool_strides, len(kernel_sizes))

    padding = [
        compute_pad_size(k, d, s, p)
        for k, d, s, p in zip(kernel_sizes, dilations, strides, pad_types)
    ]

    receptive_fields = []
    _stride = 1
    r = 0
    # recursion formula (18) of the distill.pub article
    for k, d, s, pk, ps in zip(
            kernel_sizes, dilations, strides, pool_sizes, pool_strides):
        k = d * (k - 1) + 1
        r = r + _stride * (k - 1)
        receptive_fields.insert(0, r + 1)
        _stride = _stride * s
        # pooling behaves like a kernel + stride
        if pk > 1:
            r = r + _stride * (pk - 1)
            receptive_fields[0] = r
            _stride = _stride * ps

    if center_index is None:
        return receptive_fields

    # receptive field start, recursion formula (22)
    strides_arr = np.asarray(np.concatenate(([1], strides[:-1])))
    padding_arr = np.asarray(padding)[:, 0]
    receptive_field_start = (
        center_index * _stride
        - np.sum(padding_arr * np.cumprod(strides_arr))
    )
    return receptive_fields, receptive_field_start
