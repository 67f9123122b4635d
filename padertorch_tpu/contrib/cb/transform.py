"""STFT/iSTFT function wrappers. Reference parity: ``contrib/cb/transform.py``
(``stft:12``, ``istft:162`` — paderbox-compatible semantics incl.
``symmetric_window``, ``fading`` in {'full', 'half', False} and
``num_samples`` cropping on the inverse)."""
import jax.numpy as jnp

from padertorch_tpu.ops import STFT as _STFT

__all__ = ['stft', 'istft']


def stft(signal, size=1024, shift=256, *, window='blackman',
         window_length=None, fading='full', pad=True,
         symmetric_window=False):
    """Functional STFT (complex output), paderbox-compatible semantics.

    >>> import numpy as np
    >>> stft(np.ones((2, 1000), 'float32')).shape
    (2, 7, 513)
    >>> stft(np.ones(200, 'float32'), size=100, shift=25,
    ...      fading=False).shape
    (5, 51)
    """
    op = _STFT(size=size, shift=shift, window=window,
               window_length=window_length, fading=fading, pad=pad,
               symmetric_window=symmetric_window,
               complex_representation='complex')
    return op(jnp.asarray(signal))


def istft(stft_signal, size=1024, shift=256, *, window='blackman',
          window_length=None, fading='full', symmetric_window=False,
          num_samples=None):
    """Functional iSTFT from a complex spectrogram.

    ``num_samples`` crops (or checks) the reconstruction length like the
    reference (``contrib/cb/transform.py:162``).

    >>> import numpy as np
    >>> x = np.random.RandomState(0).randn(400).astype('float32')
    >>> rec = istft(stft(x, size=128, shift=32), size=128, shift=32,
    ...             num_samples=400)
    >>> rec.shape
    (400,)
    >>> bool(np.abs(np.asarray(rec) - x).max() < 1e-5)
    True
    """
    op = _STFT(size=size, shift=shift, window=window,
               window_length=window_length, fading=fading,
               symmetric_window=symmetric_window,
               complex_representation='complex')
    signal = op.inverse(jnp.asarray(stft_signal))
    if num_samples is not None:
        assert signal.shape[-1] >= num_samples, (
            signal.shape, num_samples)
        signal = signal[..., :num_samples]
    return signal
