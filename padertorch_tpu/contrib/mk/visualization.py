"""Receptive-field region computation + plotting of CNN receptive fields.

Reference parity: ``padertorch/contrib/mk/visualization.py``.  Plotting
is gated on matplotlib (optional); the region arithmetic is pure numpy.
"""
import math
from typing import Optional

import numpy as np

from padertorch_tpu.utils.misc import to_list
from padertorch_tpu.contrib.je.modules.conv import compute_pad_size
from padertorch_tpu.contrib.mk.utils import compute_receptive_field_1d

__all__ = [
    'compute_receptive_field_region',
    'plot_receptive_field_at_time_index',
]


def compute_receptive_field_region(
    kernel_sizes, *,
    dilations=1,
    strides=1,
    pad_types='both',
    center_index=0,
    is_transpose=False,
):
    """(start, stop) input region feeding one output position.

    https://distill.pub/2019/computing-receptive-fields, eqs. (5)/(6).

    >>> compute_receptive_field_region([3, 3])
    (-2, 2)
    >>> compute_receptive_field_region([3, 3], strides=2, center_index=1)
    (-1, 5)
    """
    kernel_sizes = list(kernel_sizes)
    dilations = to_list(dilations, len(kernel_sizes))
    strides = to_list(strides, len(kernel_sizes))
    pad_types = to_list(pad_types, len(kernel_sizes))

    padding = [
        compute_pad_size(k, d, s, p)
        for k, d, s, p in zip(kernel_sizes, dilations, strides, pad_types)
    ]
    padding = np.array(padding)[:, 0]
    strides = np.array(strides, dtype=float)
    kernel_sizes = np.array(kernel_sizes)

    if is_transpose:
        strides = 1 / strides
        padding = padding * (strides >= 1)  # no padding when upsampling
        # kernel has no effect on the receptive field when upsampling
        kernel_sizes = np.where(strides < 1, 1, kernel_sizes)
    else:
        strides = np.concatenate(([1.0], strides[:-1]))
    total_stride = np.prod(strides)
    receptive_field_start = math.floor(
        center_index * total_stride
        - np.sum(padding * np.cumprod(strides)))
    receptive_field_stop = math.floor(
        center_index * total_stride
        - np.sum((1 + padding - kernel_sizes) * np.cumprod(strides)))
    return receptive_field_start, receptive_field_stop


def plot_receptive_field_at_time_index(
    signal: np.ndarray, time_index: int, cnn, *,
    cnn_transpose=None, plot_fn=None, ax=None, **kwargs,
):
    """Plot the input slice feeding one output time index of a CNN1d.

    Args:
        signal: CNN input of shape (t, ...).
        time_index: output time index whose receptive field to show.
        cnn: a ``contrib.je.modules.conv.CNN1d``-style stack (attributes
            ``kernel_size``/``dilation``/``stride``/``pad_type`` per
            layer, as lists).
        cnn_transpose: optional matching transposed stack in front.
        plot_fn: function(signal, ax=..., **kwargs); defaults to
            matplotlib imshow/plot of the slice.

    Returns:
        (start, stop) indices of the plotted region.
    """
    def _cfg(stack):
        convs = getattr(stack, 'convs', [stack])
        return dict(
            kernel_sizes=[c.kernel_size[-1] for c in convs],
            dilations=[c.dilation[-1] for c in convs],
            strides=[c.stride[-1] for c in convs],
            pad_types=[c.pad_type[-1] for c in convs],
        )

    if cnn_transpose is not None:
        t_cfg = _cfg(cnn_transpose)
        start, stop = compute_receptive_field_region(
            t_cfg['kernel_sizes'], dilations=t_cfg['dilations'],
            strides=t_cfg['strides'], pad_types=t_cfg['pad_types'],
            center_index=time_index, is_transpose=True)
        start = int(np.maximum(start, 0))
        stop = int(np.minimum(stop, signal.shape[0]))
        cfg = _cfg(cnn)
        _, start_u = compute_receptive_field_1d(
            cfg['kernel_sizes'], dilations=cfg['dilations'],
            strides=cfg['strides'], pad_types=cfg['pad_types'],
            center_index=start)
        rfield_v, start_v = compute_receptive_field_1d(
            cfg['kernel_sizes'], dilations=cfg['dilations'],
            strides=cfg['strides'], pad_types=cfg['pad_types'],
            center_index=stop)
        start = start_u
        receptive_field = start_v + rfield_v[0] - start
    else:
        cfg = _cfg(cnn)
        receptive_fields, start = compute_receptive_field_1d(
            cfg['kernel_sizes'], dilations=cfg['dilations'],
            strides=cfg['strides'], pad_types=cfg['pad_types'],
            center_index=time_index)
        receptive_field = receptive_fields[0]
    stop = int(np.minimum(start + receptive_field, signal.shape[0]))
    start = int(np.maximum(start, 0))
    plot_sig = signal[start:stop]
    if plot_fn is None:
        import matplotlib.pyplot as plt
        if ax is None:
            _, ax = plt.subplots()
        if plot_sig.ndim >= 2:
            ax.imshow(plot_sig.T, origin='lower', aspect='auto', **kwargs)
        else:
            ax.plot(plot_sig, **kwargs)
    else:
        plot_fn(plot_sig, ax=ax, **kwargs)
    return start, stop
