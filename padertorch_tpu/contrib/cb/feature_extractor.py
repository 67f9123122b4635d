"""Configurable STFT feature family.

Reference parity: ``padertorch/contrib/cb/feature_extractor.py`` —
``FeatureExtractor`` base + AbsSTFT / Log1pAbsSTFT / LogMel / Cepstrum
variants, all Configurable so recipes can swap them via config.
"""
import jax.numpy as jnp

from padertorch_tpu.base import Module
from padertorch_tpu.ops import STFT

__all__ = [
    'FeatureExtractor', 'AbstractFeatureExtractor',
    'AbsSTFT', 'Log1pAbsSTFT', 'LogMel', 'Cepstrum',
    'KaldiSTFT', 'AbsKaldiSTFT', 'kaldi_stft', 'kaldi_istft',
    'AbsIPDSTFT', 'AbsRealImagSTFT', 'Log1pCosSinAbsSTFT',
    'ScaleIndependentCepstrum',
    'sign', 'stft_to_cepstrum', 'cepstrum',
    'interchannel_phase_differences',
    'interchannel_phase_differences_op',
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


# Reference name for the Configurable feature-extractor base
# (cb/feature_extractor.py:222).
AbstractFeatureExtractor = FeatureExtractor


def kaldi_stft(time_signal, size=512, shift=160, *, axis=-1,
               window_length=400, pad=False, fading=False):
    """Kaldi-convention host STFT (reference cb/feature_extractor.py:19):
    512-point FFT over 400-sample blackman windows, 160-sample shift,
    no padding/fading.  Numpy in, numpy complex out — safe inside data
    pipeline workers.
    """
    from padertorch_tpu.ops._stft import HostSTFT
    import numpy as np
    stft = HostSTFT(size=size, shift=shift, window_length=window_length,
                    fading=fading or None, pad=pad,
                    complex_representation='complex')
    x = np.asarray(time_signal)
    if axis not in (-1, x.ndim - 1):
        x = np.moveaxis(x, axis, -1)
    out = np.asarray(stft(x))
    if axis not in (-1, time_signal.ndim - 1):
        out = np.moveaxis(out, -2, axis)
    return out


def kaldi_istft(stft_signal, size=512, shift=160, *, axis=-1,
                window_length=400, pad=False, fading=False):
    """Inverse of :func:`kaldi_stft` (reference :24).  Expects the
    frame/frequency axes last."""
    from padertorch_tpu.ops._stft import HostSTFT
    import numpy as np
    assert axis == -1, 'kaldi_istft supports trailing (frames, F) only'
    stft = HostSTFT(size=size, shift=shift, window_length=window_length,
                    fading=fading or None, pad=pad,
                    complex_representation='complex')
    return np.asarray(stft.inverse(np.asarray(stft_signal)))


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


def sign(signal, *, axis=-1, eps=1e-4, eps_style='where'):
    """Unit (phase) normalization, safe at zero.

    Reference parity: ``cb/feature_extractor.py:97`` — numpy's complex
    ``np.sign`` uses only the real part's sign, so normalize by the
    magnitude instead; ``eps_style`` guards the division.

    >>> import numpy as np
    >>> sign([1+1j, 0,  1e-4])
    array([0.70710678+0.70710678j, 0.        +0.j        ,
           1.        +0.j        ])
    """
    import numpy as np
    signal = np.asarray(signal)
    norm = np.abs(signal)
    if eps_style == 'plus':
        norm = norm + eps
    elif eps_style == 'max':
        norm = np.maximum(norm, eps)
    elif eps_style == 'where':
        norm = np.where(norm == 0, eps, norm)
    else:
        raise ValueError(eps_style)
    return signal / norm


def stft_to_cepstrum(stft_signal, norm='ortho', eps=None):
    """Cepstrum from a one-sided STFT: ``dct_I(log |rdft|)``.

    Reference parity: ``cb/feature_extractor.py:29`` — equivalent to
    ``fft(log|fft(x)|)`` of the full spectrum, computed redundancy-free
    on the rdft half via a type-I DCT.

    >>> import numpy as np
    >>> stft_to_cepstrum(np.fft.rfft([1, 2, 3, 4]))
    array([2.53758691, 0.80471896, 0.45814537])
    >>> stft_to_cepstrum(np.fft.rfft([1, 2, 3, 4, 5, 6, 7, 8]))
    array([5.67812692, 1.21752299, 0.53177166, 0.33614941, 0.28670713])
    >>> stft_to_cepstrum([1., 1, 1])
    array([0., 0., 0.])
    """
    import numpy as np
    from scipy.fftpack import dct
    stft_signal = np.asarray(stft_signal)
    assert stft_signal.shape[-1] % 2 == 1, stft_signal.shape
    mag = np.abs(stft_signal)
    if eps is None:
        eps = np.finfo(
            mag.dtype if mag.dtype.kind == 'f' else np.float64).tiny
    if eps != 0:
        mag = np.maximum(mag, eps)
    with np.errstate(divide='ignore', invalid='ignore'):
        out = dct(np.log(mag), type=1)
    if norm == 'ortho':
        out = out / np.sqrt(2 * (mag.shape[-1] - 1))
    elif norm is not None:
        raise ValueError(norm)
    return out


def cepstrum(time_signal, size=1024, shift=256, *, window='blackman',
             window_length=None, fading='full', pad=True):
    """Host-side cepstrum of a time signal (numpy STFT -> DCT-I).

    Reference parity: ``cb/feature_extractor.py:195``.
    """
    from padertorch_tpu.ops import HostSTFT
    stft = HostSTFT(
        size=size, shift=shift, window_length=window_length,
        window=window, fading=fading, pad=pad,
        complex_representation='complex')
    return stft_to_cepstrum(stft(time_signal))


class AbsIPDSTFT(FeatureExtractor):
    """[|STFT|, cos IPD, sin IPD] of a multi-channel signal, stacked on
    the feature axis. Reference: ``cb/feature_extractor.py:457``."""

    def forward(self, signal):
        import numpy as np
        return jnp.asarray(interchannel_phase_differences(
            np.asarray(self.stft(signal)), concatenate=True))


class AbsRealImagSTFT(FeatureExtractor):
    """[|STFT|, Re, Im] stacked on the feature axis.
    Reference: ``cb/feature_extractor.py:527``."""

    def forward(self, signal):
        spec = self.stft(signal)
        return jnp.concatenate(
            [jnp.abs(spec), jnp.real(spec), jnp.imag(spec)], axis=-1)


class Log1pCosSinAbsSTFT(FeatureExtractor):
    """[log1p |STFT|, cos angle, sin angle] stacked on the feature axis.
    Reference: ``cb/feature_extractor.py:495``."""

    def forward(self, signal):
        spec = self.stft(signal)
        angle = jnp.angle(spec)
        return jnp.concatenate(
            [jnp.log1p(jnp.abs(spec)), jnp.cos(angle), jnp.sin(angle)],
            axis=-1)


class ScaleIndependentCepstrum(FeatureExtractor):
    """DCT-I cepstrum without the scale-carrying 0th coefficient.
    Reference: ``cb/feature_extractor.py:567``."""

    def forward(self, signal):
        import numpy as np
        return jnp.asarray(
            stft_to_cepstrum(np.asarray(self.stft(signal)))[..., 1:])


class KaldiSTFT(FeatureExtractor):
    """Kaldi-convention framing: 512-FFT over 400-sample windows with a
    160-sample shift, no padding/fading.  Reference:
    ``feature_extractor.py:593``."""

    def __init__(self, size=512, shift=160, window_length=400, pad=False,
                 fading=False, window='blackman'):
        super().__init__(size=size, shift=shift,
                         window_length=window_length, window=window,
                         fading=fading or None, pad=pad)

    def forward(self, signal):
        return self.stft(signal)


class AbsKaldiSTFT(KaldiSTFT):
    """|KaldiSTFT|. Reference: ``feature_extractor.py:615``."""

    def forward(self, signal):
        return jnp.abs(self.stft(signal))


def _complex_sign(x):
    import numpy as np
    magnitude = np.maximum(np.abs(x), np.finfo(np.float64).tiny)
    return x / magnitude


def interchannel_phase_differences_op(a, b):
    """cos + i*sin of angle(a * conj(b)). Reference:
    ``cb/feature_extractor.py:125``."""
    return _complex_sign(a * b.conj())


def interchannel_phase_differences(signal, second_channel=None,
                                   concatenate=False, rng=None):
    """Inter-channel phase differences of a multi-channel STFT.

    signal: (..., channels, frames, features) complex.  When
    ``second_channel`` is not given, each channel is paired with a
    randomly sampled *other* channel.  Returns ``(cos, sin)`` or, with
    ``concatenate``, ``[abs, cos, sin]`` stacked on the feature axis
    (reference ``cb/feature_extractor.py:131``).

    >>> import numpy as np
    >>> sig = np.exp(1j * np.linspace(0, 1, 4))[:, None, None] \\
    ...     * np.ones((4, 2, 3))
    >>> cos, sin = interchannel_phase_differences(
    ...     sig, second_channel=[1, 0, 3, 2])
    >>> cos.shape, sin.shape
    ((4, 2, 3), (4, 2, 3))
    >>> np.allclose(cos[0], np.cos(0 - 1/3)), np.allclose(sin[1], np.sin(1/3))
    (True, True)
    """
    import numpy as np
    signal = np.asarray(signal)
    if second_channel is None:
        num_channels = signal.shape[-3]
        assert num_channels >= 2, (num_channels, signal.shape)
        rng = np.random if rng is None else rng
        # pair every channel with a random other channel
        offsets = rng.randint(1, num_channels, size=num_channels)
        second_channel = (np.arange(num_channels) + offsets) % num_channels
    second_channel = np.asarray(second_channel)
    sincos = interchannel_phase_differences_op(
        signal, signal[..., second_channel, :, :])
    if concatenate:
        return np.concatenate(
            [np.abs(signal), sincos.real, sincos.imag], axis=-1)
    return sincos.real, sincos.imag
