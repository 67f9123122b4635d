"""Array helpers. Reference parity: ``padertorch/contrib/cb/array.py``."""
import numpy as np

__all__ = ['overlap_add', 'sliding_window']


def sliding_window(x, window_length, shift, axis=-1):
    """Overlapping windows view (copy) along an axis.

    >>> sliding_window(np.arange(8), 4, 2)
    array([[0, 1, 2, 3],
           [2, 3, 4, 5],
           [4, 5, 6, 7]])
    """
    from padertorch_tpu.data.segment import segment_axis
    return segment_axis(x, window_length, shift, axis=axis, end='cut')


def overlap_add(frames, shift):
    """Overlap-add frames (n_frames, length) -> signal.

    >>> f = sliding_window(np.arange(8.), 4, 2)
    >>> overlap_add(f, 4).tolist()  # shift == length: concatenation
    [0.0, 1.0, 2.0, 3.0, 2.0, 3.0, 4.0, 5.0, 4.0, 5.0, 6.0, 7.0]
    """
    frames = np.asarray(frames)
    n, length = frames.shape[-2:]
    out_len = (n - 1) * shift + length
    out = np.zeros(frames.shape[:-2] + (out_len,), frames.dtype)
    for i in range(n):
        out[..., i * shift:i * shift + length] += frames[..., i, :]
    return out
