"""Configurable time-frequency feature modules.

Reference parity: ``padertorch/contrib/mk/modules/features/timefreq.py`` —
Configurable ``STFT`` (80), ``MelTransform`` (256), ``MFCC`` (480),
``SpecAug`` (638).
"""
import numpy as np
import jax
import jax.numpy as jnp

from padertorch_tpu.base import Module
from padertorch_tpu import random as ptrandom
from padertorch_tpu.ops import _stft

__all__ = ['STFT', 'MelTransform', 'MFCC', 'SpecAug', 'Logarithm']


class Logarithm(Module):
    """Logarithm with configurable base and eps clamp, plus inverse.

    Reference parity: ``mk/modules/features/timefreq.py:37`` —
    ``log_base`` in {None, 'e', 10, 2, False (disable), other float}.

    >>> import jax.numpy as jnp
    >>> log = Logarithm(log_base=10)
    >>> float(log(jnp.asarray(100.)))
    2.0
    >>> round(float(log.inverse(log(jnp.asarray(3.)))), 5)
    3.0
    """

    def __init__(self, log_base=10, eps=1e-5):
        self.eps = eps
        self.log_base = log_base
        if log_base is None or log_base == 'e':
            self._log = jnp.log
            self._pow = jnp.exp
        elif log_base is False:
            self._log = self._pow = lambda x: x
        elif float(log_base) in (10.0, 2.0) or float(log_base) > 0:
            base = float(log_base)
            self._log = lambda x: jnp.log(x) / np.log(base)
            self._pow = lambda x: jnp.power(base, x)
        else:
            raise ValueError(f'log_base {log_base} is not supported')

    def forward(self, x):
        if self.log_base is False:
            return x
        return self._log(jnp.maximum(x, self.eps))

    def inverse(self, x):
        return self._pow(x)


class STFT(Module):
    """Configurable STFT module wrapper (mk/timefreq.py:80)."""

    def __init__(self, size=1024, shift=256, window_length=None,
                 window='blackman', fading='full', pad=True,
                 complex_representation='complex'):
        self.stft = _stft.STFT(
            size=size, shift=shift, window_length=window_length,
            window=window, fading=fading, pad=pad,
            complex_representation=complex_representation)
        self.size = size
        self.shift = shift

    def forward(self, x, sequence_lengths=None):
        out = self.stft(x)
        if sequence_lengths is not None:
            num_frames = [
                self.stft.samples_to_frames(int(n))
                for n in np.asarray(sequence_lengths)
            ]
            return out, jnp.asarray(num_frames)
        return out, None

    def inverse(self, x):
        return self.stft.inverse(x)


class MelTransform(Module):
    """Configurable mel transform (mk/timefreq.py:256)."""

    def __init__(self, sample_rate=16000, stft_size=1024,
                 number_of_filters=80, lowest_frequency=50.0,
                 highest_frequency=None, log=True):
        from padertorch_tpu.contrib.je.modules.features import (
            MelTransform as JeMel,
        )
        self.mel = JeMel(
            sample_rate=sample_rate, stft_size=stft_size,
            number_of_filters=number_of_filters,
            lowest_frequency=lowest_frequency,
            highest_frequency=highest_frequency, log=log)
        self.number_of_filters = number_of_filters

    def forward(self, spectrogram):
        return self.mel(spectrogram)

    def inverse(self, x):
        return self.mel.inverse(x)


def _dct_matrix(n_mfcc, n_mels):
    """Type-II DCT with ortho norm, (n_mfcc, n_mels)."""
    n = np.arange(n_mels)
    k = np.arange(n_mfcc)[:, None]
    dct = np.cos(np.pi / n_mels * (n + 0.5) * k)
    dct[0] *= 1.0 / np.sqrt(2)
    dct *= np.sqrt(2.0 / n_mels)
    return dct.astype(np.float32)


class MFCC(Module):
    """Mel-frequency cepstral coefficients (mk/timefreq.py:480).

    Input: log-mel (..., frames, n_mels) -> (..., frames, n_mfcc).
    """

    def __init__(self, n_mfcc=13, n_mels=80):
        self.n_mfcc = n_mfcc
        self.register_buffer(
            'dct', jnp.asarray(_dct_matrix(n_mfcc, n_mels).T))

    def forward(self, log_mel):
        return log_mel @ self.dct


class SpecAug(Module):
    """SpecAugment time/frequency masking (mk/timefreq.py:638).

    Input: (..., frames, features). Active only in training mode.
    """

    def __init__(self, n_time_masks=2, max_masked_time_steps=70,
                 n_frequency_masks=2, max_masked_frequency_bands=20):
        self.n_time_masks = n_time_masks
        self.max_masked_time_steps = max_masked_time_steps
        self.n_frequency_masks = n_frequency_masks
        self.max_masked_frequency_bands = max_masked_frequency_bands

    def forward(self, x, sequence_lengths=None):
        if not self.training:
            return x
        t, f = x.shape[-2], x.shape[-1]
        batch_shape = x.shape[:-2]
        b = int(np.prod(batch_shape)) if batch_shape else 1
        y = x.reshape(b, t, f)
        for axis, n_masks, max_width in [
            (1, self.n_time_masks, min(self.max_masked_time_steps, t)),
            (2, self.n_frequency_masks,
             min(self.max_masked_frequency_bands, f)),
        ]:
            size = y.shape[axis]
            for _ in range(n_masks):
                k1, k2 = ptrandom.next_key(), ptrandom.next_key()
                width = jax.random.randint(k1, (b,), 0, max_width + 1)
                onset = jax.random.randint(k2, (b,), 0, size)
                idx_shape = [1, 1, 1]
                idx_shape[axis] = size
                idx = jnp.arange(size).reshape(idx_shape)
                bshape = [b, 1, 1]
                mask = (idx < onset.reshape(bshape)) | (
                    idx >= (onset + width).reshape(bshape))
                y = y * mask.astype(y.dtype)
        return y.reshape(x.shape)
