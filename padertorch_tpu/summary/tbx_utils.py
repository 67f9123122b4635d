"""Review-dict builders and tensorboard payload converters.

Reference parity: ``padertorch/summary/tbx_utils.py`` — dB-scaled
spectrogram images with colormaps, mask images, normalized audio,
figure checks, ``review_dict``.
"""
import operator
from typing import Optional, Tuple

import numpy as np

from padertorch_tpu.utils.misc import to_numpy


def _to_numpy_float(x):
    """Host array for TB conversion; low-precision floats -> float32.

    Snapshots produced under the trainer's bfloat16 policy arrive as
    ml_dtypes.bfloat16 arrays, which numpy's ufunc/finfo machinery does
    not treat as inexact — image/audio conversion math runs in f32.
    """
    x = to_numpy(x, detach=True)
    if x.dtype.name in ('bfloat16', 'float16', 'float8_e4m3fn',
                        'float8_e5m2'):
        x = x.astype(np.float32)
    return x

__all__ = [
    'mask_to_image',
    'stft_to_image',
    'spectrogram_to_image',
    'review_dict',
    'audio',
    'figure',
    'figure_to_image',
]


def _remove_batch_axis(array, batch_first, ndim=2):
    if array.ndim == ndim:
        pass
    elif array.ndim == ndim + 1:
        if batch_first is True:
            array = array[0]
        elif batch_first is False:
            array = array[:, 0]
        elif batch_first is None:
            raise ValueError(
                '"remove batch axis" is disabled (batch_first=None) but '
                f'the array still has a batch axis. Shape: {array.shape}')
    else:
        raise ValueError(
            f'Either the signal has ndim {ndim} or {ndim + 1}', array.shape)
    return array


def _apply_origin(image, origin):
    """origin='lower' flips the feature axis (for speech usually lower)."""
    assert origin in ['upper', 'lower'], origin
    if origin == 'lower':
        image = image[..., ::-1, :]
    return image


class _Colorize:
    """Colormap dispatcher with per-name cache (grayscale fallback).

    Golden values match the reference (``tbx_utils.py:160-215``):

    >>> c = _Colorize()
    >>> i = np.arange(15).reshape([3, 5])
    >>> c(i, True).shape
    (4, 3, 5)
    >>> c(i, None).shape
    (1, 3, 5)
    >>> i = np.arange(6).reshape([2, 3])
    >>> c(i, True)
    array([[[0.267004, 0.26851 , 0.269944],
            [0.271305, 0.272594, 0.273809]],
    <BLANKLINE>
           [[0.004874, 0.009605, 0.014625],
            [0.019942, 0.025563, 0.031497]],
    <BLANKLINE>
           [[0.329415, 0.335427, 0.341379],
            [0.347269, 0.353093, 0.358853]],
    <BLANKLINE>
           [[1.      , 1.      , 1.      ],
            [1.      , 1.      , 1.      ]]])
    >>> print(c(i, None))
    [[[0 1 2]
      [3 4 5]]]
    """

    def __init__(self):
        self.color_to_cmap = {}

    def __call__(self, image, color):
        if color is None:
            return image[None, :, :]
        if color is True:
            color = 'viridis'
        try:
            cmap = self.color_to_cmap[color]
        except KeyError:
            try:
                import matplotlib.pyplot as plt
                cmap = plt.get_cmap(color)
            except ImportError:
                from warnings import warn
                warn('matplotlib is not installed; images are grayscale')
                def cmap(x):  # noqa: E306
                    return x[..., None]
            # cache the fallback too, so the warning fires once
            self.color_to_cmap[color] = cmap
        return np.moveaxis(cmap(image), -1, 0)


_colorize = _Colorize()


def mask_to_image(mask, batch_first: bool = False,
                  color: Optional[str] = None,
                  origin: str = 'lower') -> np.ndarray:
    """Image (color, features, frames) from a [0, 1] mask (frames, feats).

    >>> mask_to_image(np.random.uniform(size=(10, 4))).shape
    (1, 4, 10)
    """
    mask = _to_numpy_float(mask)
    clipped = np.sum((mask < 0) | (mask > 1))
    if clipped:
        import warnings
        warnings.warn(
            f'Mask value passed to mask_to_image out of range ([0, 1])! '
            f'{clipped} values are clipped!')
    image = np.clip(mask * 255, 0, 255).astype(np.uint8)
    image = _remove_batch_axis(image, batch_first=batch_first)
    return _colorize(_apply_origin(image.T, origin), color)


def stft_to_image(signal, batch_first: bool = False, color: str = 'viridis',
                  origin: str = 'lower',
                  visible_dB: float = 50) -> np.ndarray:
    """Image from an STFT signal (frames, features), magnitude or complex.

    >>> data = [1, 0.004, 0.003, 0.00105, 0.001]
    >>> np.squeeze(stft_to_image(
    ...     np.array(data)[:, None], color=None)).tolist()
    [255, 10, 0, 0, 0]
    >>> np.squeeze(stft_to_image(
    ...     np.array(data)[:, None], color=None, visible_dB=60)).tolist()
    [255, 51, 40, 1, 0]
    """
    signal = _to_numpy_float(signal)
    return spectrogram_to_image(
        signal.real ** 2 + signal.imag ** 2,
        batch_first=batch_first, color=color, origin=origin,
        visible_dB=visible_dB)


def spectrogram_to_image(signal, batch_first: bool = False,
                         color: str = 'viridis', origin: str = 'lower',
                         log: bool = True,
                         visible_dB: float = 50) -> np.ndarray:
    """Image from a power spectrogram; log scale shows ``visible_dB`` dB."""
    signal = _to_numpy_float(signal)
    signal = signal / (np.max(np.abs(signal))
                       + np.finfo(np.asarray(signal).dtype).tiny)
    signal = _remove_batch_axis(signal, batch_first=batch_first)
    if log:
        floor = 10 ** (-visible_dB / 10)
        signal = np.maximum(signal, floor)
        signal = (10 / visible_dB) * np.log10(signal) + 1
    signal = (signal * 255).astype(np.uint8)
    return _colorize(_apply_origin(signal.T, origin=origin), color)


def audio(signal, sampling_rate: int = 16000, batch_first: bool = False,
          normalize: bool = True) -> Tuple[np.ndarray, int]:
    """(signal, sampling_rate) tuple, normalized to 0.95 peak.

    >>> sig, sr = audio(np.array([0.0, 0.5, -0.25]))
    >>> sr, float(np.abs(sig).max())
    (16000, 0.95)
    """
    signal = _to_numpy_float(signal)
    if signal.dtype.kind == 'c':
        raise ValueError(
            f'Complex dtype ({signal.dtype}) is not supported for audio.')
    signal = _remove_batch_axis(signal, batch_first=batch_first, ndim=1)
    if normalize:
        denominator = np.max(np.abs(signal))
        if denominator > 0:
            signal = signal / denominator * 0.95
    return signal, sampling_rate


def figure_to_image(fig=None, close=True) -> np.ndarray:
    """matplotlib figure -> (color, height, width) array."""
    from tensorboardX.utils import figure_to_image as tbx_figure_to_image
    return tbx_figure_to_image(figure(fig, close=close), close=False)


def figure(fig=None, close=True):
    """Validate a matplotlib figure for the review dict."""
    from matplotlib.figure import Figure
    if fig is None:
        from matplotlib import pyplot as plt
        fig = plt.gcf()
    assert isinstance(fig, Figure), fig
    assert len(fig.axes) > 0, (
        'Empty plot detected. You probably wanted to plot something.')
    if close:
        import matplotlib.pyplot as plt
        plt.close(fig)
    return fig


def review_dict(
        *,
        loss=None,
        losses: dict = None,
        scalars: dict = None,
        histograms: dict = None,
        audios: dict = None,
        images: dict = None,
        figures: dict = None,
        texts: dict = None,
):
    """Typed helper to build a review dict (exactly one of loss/losses)."""
    review = locals()
    for k, v in list(review.items()):
        if v is None:
            del review[k]
    assert operator.xor(loss is None, losses is None), (loss, losses)
    return review
