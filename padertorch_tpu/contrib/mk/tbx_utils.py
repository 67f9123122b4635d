"""Tensorboard image helpers (grids of batched images/spectrograms).

Reference parity: ``padertorch/contrib/mk/tbx_utils.py``.  The reference
uses ``torchvision.utils.make_grid``; here a small numpy ``make_grid``
replaces it (torchvision is not a dependency).
"""
import typing as tp

import numpy as np

from padertorch_tpu.utils.misc import to_numpy
from padertorch_tpu.summary.tbx_utils import spectrogram_to_image

__all__ = ['tensor_to_image', 'batch_image_to_grid', 'make_grid']


def tensor_to_image(signal, input_type: str, sequence_last: bool = True):
    """Array -> uint8 image; ``input_type`` 'image' ([0,1] floats) or
    'spectrogram' (colormapped via summary.tbx_utils)."""
    x = to_numpy(signal)
    if input_type == 'image':
        x = (x * 255).astype(np.uint8)
    elif input_type == 'spectrogram':
        if sequence_last:
            x = np.swapaxes(x, -1, -2)
        x = spectrogram_to_image(x, batch_first=None, log=False)
    else:
        raise ValueError(f'Unknown input type {input_type}')
    return x


def make_grid(batch, nrow=8, padding=2, normalize=True, scale_each=False,
              pad_value=0.0):
    """Arrange a (B, C, H, W) batch into one (C, H', W') image grid.

    Mirrors torchvision.utils.make_grid's behavior for the options the
    reference uses.

    >>> grid = make_grid(np.random.rand(4, 3, 32, 32), nrow=1)
    >>> grid.shape
    (3, 138, 36)
    """
    batch = np.asarray(batch, dtype=np.float32)
    assert batch.ndim == 4, batch.shape
    b, c, h, w = batch.shape

    def _norm(x):
        lo, hi = x.min(), x.max()
        return (x - lo) / max(hi - lo, 1e-5)

    if normalize:
        if scale_each:
            batch = np.stack([_norm(img) for img in batch])
        else:
            batch = _norm(batch)
    ncol = min(nrow, b)
    nrows = -(-b // ncol)
    grid = np.full(
        (c, padding + nrows * (h + padding),
         padding + ncol * (w + padding)),
        pad_value, dtype=np.float32)
    for idx in range(b):
        r, col = divmod(idx, ncol)
        y = padding + r * (h + padding)
        x = padding + col * (w + padding)
        grid[:, y:y + h, x:x + w] = batch[idx]
    return grid


def batch_image_to_grid(
    batch_image,
    input_shape_format: str = 'bchw',
    height_axis: tp.Optional[str] = None,
    width_axis: tp.Optional[str] = None,
    sequence_axis: tp.Optional[str] = None,
    stack: tp.Optional[str] = None,
    origin: str = 'upper',
    normalize: bool = True,
    scale_each: bool = False,
):
    """Stack a batch of (spectrogram) images into one grid image.

    >>> grid = batch_image_to_grid(np.random.rand(4, 3, 32, 32))
    >>> grid.shape
    (3, 138, 36)
    >>> grid = batch_image_to_grid(
    ...     np.random.rand(4, 32, 32), input_shape_format='b h w')
    >>> grid.shape
    (138, 36)

    Args:
        batch_image: (batch, channel, height, width) or
            (batch, height, width).
        input_shape_format: space-separated (or contiguous) dimension
            names, e.g. ``'b c h w'``.
        height_axis / width_axis: names of the height (frequency) and
            width (time) axes; default to the last two format entries.
        sequence_axis: if given and last, stack along the height axis.
        stack: ``height_axis`` for vertical, ``width_axis`` for
            horizontal stacking.
        origin: 'upper' or 'lower' (flips the height axis).
    """
    if origin not in ('upper', 'lower'):
        raise ValueError(
            f'"origin" should be "upper" or "lower" but got {origin}')
    batch_image = to_numpy(batch_image)

    dims = input_shape_format.split() if ' ' in input_shape_format \
        else list(input_shape_format)
    if height_axis is None:
        height_axis = dims[-2]
    if width_axis is None:
        width_axis = dims[-1]
    if height_axis == width_axis:
        raise ValueError(
            f'Height and width axis should be different but got '
            f'{height_axis} for both "height_axis" and "width_axis"')
    if stack is None:
        if sequence_axis is not None:
            sequence_last = dims[-1] == sequence_axis
            stack = height_axis if sequence_last else width_axis
        else:
            stack = height_axis
    if stack not in (height_axis, width_axis):
        raise ValueError(
            f'"stack" should be "{height_axis}" or "{width_axis}" '
            f'but got {stack}')
    if len(dims) != batch_image.ndim:
        raise ValueError(
            f'Shape format {input_shape_format} does not match input '
            f'shape {batch_image.shape}')

    squeeze_channel = False
    if batch_image.ndim == 3:
        batch_image = batch_image[:, None]
        dims.insert(1, 'c')
        squeeze_channel = True
    if origin == 'lower':
        batch_image = np.flip(batch_image, axis=dims.index(height_axis))

    grid = make_grid(
        batch_image,
        normalize=normalize,
        scale_each=scale_each,
        nrow=1 if stack == height_axis else batch_image.shape[0],
    )
    if squeeze_channel or batch_image.shape[1] == 1:
        grid = grid[0]
    return grid
