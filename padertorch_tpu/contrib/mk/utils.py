"""Receptive-field arithmetic for 1D CNN stacks.

Behavioral parity with ``padertorch/contrib/mk/utils.py``
(``compute_receptive_field_1d``), re-derived from the closed forms in
https://distill.pub/2019/computing-receptive-fields (eqs. 2 and 6)
instead of the reference's running recursion: each conv (and each
pooling window, treated as an extra stage) contributes
``(k_eff - 1) * prod(earlier strides)`` to the receptive field, and the
start index subtracts the stride-weighted left paddings.
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
    n = len(list(kernel_sizes))
    layers = list(zip(
        list(kernel_sizes),
        to_list(dilations, n),
        to_list(strides, n),
        to_list(pool_sizes, n),
        to_list(pool_strides, n),
    ))

    # Expand each layer into (effective_kernel, stride) stages; a pooling
    # window acts as one more stage.  jump = prod of strides *before* a
    # stage (the distill article's j).
    per_layer_sizes = []
    jump = 1
    growth = 0  # sum of (k_eff - 1) * jump so far
    for kernel, dilation, stride, pool_size, pool_stride in layers:
        k_eff = dilation * (kernel - 1) + 1
        growth += (k_eff - 1) * jump
        jump *= stride
        size = growth + 1
        if pool_size > 1:
            growth += (pool_size - 1) * jump
            jump *= pool_stride
            # reference quirk kept for parity: the pooled layer's stored
            # size omits the +1
            size = growth
        per_layer_sizes.append(size)
    per_layer_sizes.reverse()

    if center_index is None:
        return per_layer_sizes

    # Start index (eq. 6): weight each layer's left padding by the jump
    # in front of it.
    left_pads = np.asarray([
        compute_pad_size(kernel, dilation, stride, pad_type)[0]
        for (kernel, dilation, stride, _, _), pad_type in zip(
            layers, to_list(pad_types, n))
    ])
    jumps = np.cumprod(
        np.concatenate(([1], [stride for _, _, stride, _, _ in
                              layers[:-1]])))
    start = center_index * jump - np.sum(left_pads * jumps)
    return per_layer_sizes, start
