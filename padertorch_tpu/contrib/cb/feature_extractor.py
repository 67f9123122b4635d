"""Configurable STFT feature family.

Reference parity: ``padertorch/contrib/cb/feature_extractor.py`` —
``FeatureExtractor`` base + AbsSTFT / Log1pAbsSTFT / LogMel / Cepstrum
variants, all Configurable so recipes can swap them via config.
"""
import jax.numpy as jnp

from padertorch_tpu.base import Module
from padertorch_tpu.ops import STFT

__all__ = [
    'FeatureExtractor', 'AbsSTFT', 'Log1pAbsSTFT', 'LogMel', 'Cepstrum',
]


class FeatureExtractor(Module):
    """Base: time signal (..., T) -> features (..., frames, D)."""

    def __init__(self, size=512, shift=128, window_length=None,
                 window='blackman', fading='full', pad=True):
        self.stft = STFT(
            size=size, shift=shift, window_length=window_length,
            window=window, fading=fading, pad=pad,
            complex_representation='complex')
        self.size = size
        self.shift = shift

    def forward(self, signal):
        raise NotImplementedError


class AbsSTFT(FeatureExtractor):
    """|STFT|. Reference: feature_extractor.py:449."""

    def forward(self, signal):
        return jnp.abs(self.stft(signal))


class Log1pAbsSTFT(FeatureExtractor):
    """log(1 + |STFT|). Reference: feature_extractor.py:478."""

    def forward(self, signal):
        return jnp.log1p(jnp.abs(self.stft(signal)))


class LogMel(FeatureExtractor):
    """log mel power spectrogram."""

    def __init__(self, sample_rate=16000, n_mels=64, **kwargs):
        super().__init__(**kwargs)
        from padertorch_tpu.contrib.je.modules.features import MelTransform
        self.mel = MelTransform(
            sample_rate=sample_rate, stft_size=self.size,
            number_of_filters=n_mels, log=True)

    def forward(self, signal):
        spec = self.stft(signal)
        power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
        return self.mel(power)


class Cepstrum(FeatureExtractor):
    """Real cepstrum of the magnitude spectrum. Reference: :563."""

    def __init__(self, num_coefficients=None, **kwargs):
        super().__init__(**kwargs)
        self.num_coefficients = num_coefficients

    def forward(self, signal):
        log_mag = jnp.log(jnp.abs(self.stft(signal)) + 1e-10)
        cep = jnp.fft.irfft(log_mag, axis=-1)
        if self.num_coefficients is not None:
            cep = cep[..., :self.num_coefficients]
        return cep
