"""STFT/iSTFT function wrappers. Reference parity: ``contrib/cb/transform.py``."""
import jax.numpy as jnp

from padertorch_tpu.ops import STFT as _STFT

__all__ = ['stft', 'istft']


def stft(signal, size=1024, shift=256, *, window='blackman',
         window_length=None, fading='full', pad=True):
    """Functional STFT (complex output), paderbox-compatible semantics.

    >>> import numpy as np
    >>> stft(np.ones((2, 1000), 'float32')).shape
    (2, 7, 513)
    """
    op = _STFT(size=size, shift=shift, window=window,
               window_length=window_length, fading=fading, pad=pad,
               complex_representation='complex')
    return op(jnp.asarray(signal))


def istft(stft_signal, size=1024, shift=256, *, window='blackman',
          window_length=None, fading='full'):
    """Functional iSTFT from a complex spectrogram."""
    op = _STFT(size=size, shift=shift, window=window,
               window_length=window_length, fading=fading,
               complex_representation='complex')
    return op.inverse(jnp.asarray(stft_signal))
