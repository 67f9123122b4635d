"""Mel/log-mel feature extraction.

Reference parity: ``padertorch/contrib/je/modules/features.py`` —
``MelTransform`` (HTK or Slaney mel triangular filterbank as one matmul,
invertible), ``NormalizedLogMelExtractor`` (mel + log + input
normalization + optional deltas + SpecAugment-style masking),
``DeltaExtractor`` (Savitzky-Golay deltas as a depthwise conv).

The filterbank matmul and the delta convolution both map directly onto the
MXU; everything is jit-safe.
"""
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from padertorch_tpu.base import Module
from padertorch_tpu import random as ptrandom
from padertorch_tpu.modules.normalization import (
    Normalization, InputNormalization,
)

__all__ = [
    'get_fbanks',
    'MelTransform',
    'NormalizedLogMelExtractor',
    'FusedAudioLogMelExtractor',
    'DeltaExtractor',
    'hz2mel',
    'mel2hz',
]


def hz2mel(f, htk_mel=True):
    """Convert Hz to mel (HTK or Slaney convention).

    >>> round(float(hz2mel(1000.)), 1)
    1000.0
    """
    f = np.asarray(f, dtype=np.float64)
    if htk_mel:
        return 2595.0 * np.log10(1 + f / 700.0)
    # Slaney: linear below 1 kHz
    f_sp = 200.0 / 3
    mel = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(
        f >= min_log_hz,
        min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep,
        mel,
    )


def mel2hz(m, htk_mel=True):
    m = np.asarray(m, dtype=np.float64)
    if htk_mel:
        return 700.0 * (10 ** (m / 2595.0) - 1)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(
        m >= min_log_mel,
        min_log_hz * np.exp(logstep * (m - min_log_mel)),
        m * f_sp,
    )


def get_fbanks(sample_rate, stft_size, number_of_filters,
               lowest_frequency=50.0, highest_frequency=None, htk_mel=True):
    """Triangular mel filterbank, shape (number_of_filters, stft_size//2+1).

    (Native replacement for ``paderbox.transform.module_fbank.get_fbanks``.)

    >>> fb = get_fbanks(16000, 512, 40)
    >>> fb.shape
    (40, 257)
    >>> bool((fb >= 0).all())
    True
    """
    if highest_frequency is None:
        highest_frequency = sample_rate / 2
    elif highest_frequency < 0:
        highest_frequency = sample_rate / 2 + highest_frequency
    n_bins = stft_size // 2 + 1
    freqs = np.linspace(0, sample_rate / 2, n_bins)
    mel_edges = np.linspace(
        hz2mel(lowest_frequency, htk_mel),
        hz2mel(highest_frequency, htk_mel),
        number_of_filters + 2,
    )
    hz_edges = mel2hz(mel_edges, htk_mel)
    lower = hz_edges[:-2][:, None]
    center = hz_edges[1:-1][:, None]
    upper = hz_edges[2:][:, None]
    up_ramp = (freqs[None, :] - lower) / np.maximum(center - lower, 1e-10)
    down_ramp = (upper - freqs[None, :]) / np.maximum(upper - center, 1e-10)
    fbanks = np.maximum(0.0, np.minimum(up_ramp, down_ramp))
    return fbanks.astype(np.float64)


class MelTransform(Module):
    """Linear power spectrogram (..., frames, F) -> (log) mel (..., frames, M).

    Reference parity: ``contrib/je/modules/features.py:214``.

    >>> from padertorch_tpu import random as ptrandom
    >>> ptrandom.seed(0)
    >>> mel = MelTransform(16000, 512, 40)
    >>> import jax.numpy as jnp
    >>> spec = jnp.ones((3, 1, 100, 257))
    >>> mel(spec).shape
    (3, 1, 100, 40)
    >>> mel.inverse(mel(spec)).shape
    (3, 1, 100, 257)
    """

    def __init__(
            self,
            sample_rate: int,
            stft_size: int,
            number_of_filters: int,
            lowest_frequency: Optional[float] = 50.0,
            highest_frequency: Optional[float] = None,
            htk_mel=True,
            log: bool = True,
            eps=1e-12,
    ):
        self.sample_rate = sample_rate
        self.stft_size = stft_size
        self.number_of_filters = number_of_filters
        self.lowest_frequency = lowest_frequency
        self.highest_frequency = highest_frequency
        self.htk_mel = htk_mel
        self.log = log
        self.eps = eps
        fbanks = get_fbanks(
            sample_rate=sample_rate,
            stft_size=stft_size,
            number_of_filters=number_of_filters,
            lowest_frequency=lowest_frequency,
            highest_frequency=highest_frequency,
            htk_mel=htk_mel,
        ).astype(np.float32)
        fbanks = fbanks / (fbanks.sum(axis=-1, keepdims=True) + 1e-6)
        self.register_buffer('fbanks', jnp.asarray(fbanks.T))  # (F, M)

    def forward(self, x):
        x = x @ self.fbanks
        if self.log:
            x = jnp.log(x + self.eps)
        return x

    def inverse(self, x):
        """Pseudo-inverse of the filterbank transform."""
        ifbanks = self.fbanks.T  # (M, F)
        ifbanks = ifbanks / (ifbanks.sum(axis=-2, keepdims=True) + 1e-6)
        if self.log:
            x = jnp.exp(x)
        return jnp.maximum(x @ ifbanks, 0.0)


class DeltaExtractor(Module):
    """Savitzky-Golay delta features over the time axis of (B, C, M, T).

    Reference parity: ``contrib/je/modules/features.py:341``.
    """

    def __init__(self, width=5, order=1):
        from scipy.signal import savgol_coeffs
        self.width = width
        self.order = order
        coeffs = savgol_coeffs(width, order, deriv=order, delta=1.0)
        self.register_buffer(
            'coeffs', jnp.asarray(coeffs[::-1].copy(), dtype='float32'))

    def forward(self, x, seq_len=None):
        b, c, m, t = x.shape
        pad = self.width // 2
        xp = jnp.pad(x, ((0, 0),) * 3 + ((pad, pad),), mode='edge')
        kernel = self.coeffs.reshape(1, 1, 1, -1)
        y = jax.lax.conv_general_dilated(
            xp.reshape(b * c, 1, m, -1), kernel,
            window_strides=(1, 1), padding='VALID',
            dimension_numbers=('NCHW', 'OIHW', 'NCHW'),
        )
        return y.reshape(b, c, m, t)


class NormalizedLogMelExtractor(Module):
    """STFT (stacked re/im) -> normalized log-mel (+ deltas, + masking).

    Input: (B, C, T, F, 2) stacked-complex STFT.
    Output: ((B, C', M, T), seq_len) with C' = C * (1+deltas+delta_deltas).
    Reference parity: ``contrib/je/modules/features.py:17``.

    >>> from padertorch_tpu import random as ptrandom
    >>> ptrandom.seed(0)
    >>> import jax.numpy as jnp
    >>> x = jnp.ones((10, 1, 100, 257, 2))
    >>> NormalizedLogMelExtractor(16000, 512, 40).eval()(x)[0].shape
    (10, 1, 40, 100)
    >>> NormalizedLogMelExtractor(
    ...     16000, 512, 40, add_deltas=True,
    ...     add_delta_deltas=True).eval()(x)[0].shape
    (10, 3, 40, 100)
    """

    def __init__(
            self, sample_rate, stft_size, number_of_filters, *,
            num_channels=1,
            lowest_frequency=50, highest_frequency=None, htk_mel=True,
            add_deltas=False, add_delta_deltas=False,
            norm_statistics_axis='bt', norm_eps=1e-5, batch_norm=False,
            clamp=6,
            n_time_masks=0, max_masked_time_steps=70,
            max_masked_time_rate=1.,
            n_frequency_masks=0, max_masked_frequency_bands=20,
            max_masked_frequency_rate=1.,
    ):
        self.mel_transform = MelTransform(
            sample_rate=sample_rate,
            stft_size=stft_size,
            number_of_filters=number_of_filters,
            lowest_frequency=lowest_frequency,
            highest_frequency=highest_frequency,
            htk_mel=htk_mel,
            log=True,
        )
        self.deltas_extractor = DeltaExtractor(order=1) if add_deltas \
            else None
        self.delta_deltas_extractor = DeltaExtractor(order=2) \
            if add_delta_deltas else None
        norm_cls = Normalization if batch_norm else InputNormalization
        self.norm = norm_cls(
            data_format='bcft',
            shape=(
                None,
                (1 + add_deltas + add_delta_deltas) * num_channels,
                number_of_filters,
                None,
            ),
            statistics_axis=norm_statistics_axis,
            shift=True,
            scale=True,
            eps=norm_eps,
            independent_axis=None,
            momentum=None,
        )
        self.clamp = clamp
        self.n_time_masks = n_time_masks
        self.max_masked_time_steps = max_masked_time_steps
        self.max_masked_time_rate = max_masked_time_rate
        self.n_frequency_masks = n_frequency_masks
        self.max_masked_frequency_bands = max_masked_frequency_bands
        self.max_masked_frequency_rate = max_masked_frequency_rate

    def forward(self, x, seq_len=None):
        # (B, C, T, F, 2) -> power -> mel -> (B, C, M, T)
        power = x[..., 0] ** 2 + x[..., 1] ** 2
        y = self.mel_transform(power)  # (B, C, T, M)
        y = jnp.swapaxes(y, -2, -1)  # (B, C, M, T)
        feats = [y]
        if self.deltas_extractor is not None:
            feats.append(self.deltas_extractor(y))
        if self.delta_deltas_extractor is not None:
            feats.append(self.delta_deltas_extractor(y))
        y = jnp.concatenate(feats, axis=1)
        y = self.norm(y, sequence_lengths=seq_len)
        if self.clamp is not None:
            y = jnp.clip(y, -self.clamp, self.clamp)
        if self.training and (self.n_time_masks or self.n_frequency_masks):
            y = self._spec_augment(y, seq_len)
        return y, seq_len

    # shared by FusedAudioLogMelExtractor
    def _spec_augment(self, y, seq_len):
        """SpecAugment-style time/frequency masking (jit-safe)."""
        b, c, m, t = y.shape
        max_t = min(self.max_masked_time_steps,
                    int(t * self.max_masked_time_rate))
        for _ in range(self.n_time_masks):
            key1, key2 = (ptrandom.next_key(), ptrandom.next_key())
            width = jax.random.randint(key1, (b, 1, 1, 1), 0, max_t + 1)
            onset = jax.random.randint(key2, (b, 1, 1, 1), 0, t)
            idx = jnp.arange(t).reshape(1, 1, 1, t)
            mask = (idx < onset) | (idx >= onset + width)
            y = y * mask.astype(y.dtype)
        max_f = min(self.max_masked_frequency_bands,
                    int(m * self.max_masked_frequency_rate))
        for _ in range(self.n_frequency_masks):
            key1, key2 = (ptrandom.next_key(), ptrandom.next_key())
            width = jax.random.randint(key1, (b, 1, 1, 1), 0, max_f + 1)
            onset = jax.random.randint(key2, (b, 1, 1, 1), 0, m)
            idx = jnp.arange(m).reshape(1, 1, m, 1)
            mask = (idx < onset) | (idx >= onset + width)
            y = y * mask.astype(y.dtype)
        return y

    def inverse(self, x):
        return self.mel_transform.inverse(
            jnp.swapaxes(self.norm.inverse(x), -2, -1))


class FusedAudioLogMelExtractor(Module):
    """Raw audio -> normalized log-mel, computed ON DEVICE.

    The whole frontend (framing, windowed DFT, mel matmul, log,
    normalization) runs inside the model's jitted step, so the data
    pipeline ships raw int16/float32 audio instead of host-computed
    STFTs — less host CPU, less host->device bandwidth (a 4 s utterance
    is 64 kB of audio vs ~1 MB of stacked-complex STFT).

    ``backend='auto'`` uses the fused Pallas kernel
    (``ops/pallas/logmel.py``) on TPU when the hop divides the window,
    and the XLA-composed jnp path otherwise — both produce
    ``log(power @ fbanks + eps)`` with identical filterbanks (tested
    against each other in ``tests/test_ops/test_pallas.py``).

    Output matches ``NormalizedLogMelExtractor``'s layout:
    ``((B, 1, M, frames), seq_len_frames)``.

    >>> from padertorch_tpu import random as ptrandom
    >>> ptrandom.seed(0)
    >>> ex = FusedAudioLogMelExtractor(16000, 512, 128, 40).eval()
    >>> y, seq_len = ex(jnp.ones((2, 4000)), seq_len=jnp.asarray([4000, 2000]))
    >>> y.shape, np.asarray(seq_len).tolist()
    ((2, 1, 40, 35), [35, 19])
    """

    def __init__(
            self, sample_rate, stft_size, shift, number_of_filters, *,
            window_length=None, window='blackman', fading='full',
            lowest_frequency=50, highest_frequency=None,
            norm_statistics_axis='bt', norm_eps=1e-5, clamp=6,
            backend='auto',
    ):
        from padertorch_tpu.ops._stft import STFT
        self.sample_rate = sample_rate
        self.stft_size = stft_size
        self.shift = shift
        self.window_length = window_length or stft_size
        self.number_of_filters = number_of_filters
        self.backend = backend
        # jnp path building blocks (also the numerics oracle)
        self._stft = STFT(
            stft_size, shift, window_length=window_length, window=window,
            fading=fading, complex_representation='stacked',
            dtype='float32')
        fb = get_fbanks(
            sample_rate, stft_size, number_of_filters,
            lowest_frequency=lowest_frequency,
            highest_frequency=highest_frequency).astype(np.float32)
        fb = fb / (fb.sum(-1, keepdims=True) + 1e-6)
        # buffer, NOT a parameter: a trained filterbank can go negative
        # and log(power @ fbanks) NaNs
        self.register_buffer('fbanks', jnp.asarray(fb.T))  # (F, M)
        self._frontend_kwargs = dict(
            sample_rate=sample_rate, size=stft_size, shift=shift,
            window_length=self.window_length, n_mels=number_of_filters,
            window=window, lowest_frequency=lowest_frequency,
            highest_frequency=highest_frequency, fading=fading)
        self.norm = InputNormalization(
            data_format='bcft',
            shape=(None, 1, number_of_filters, None),
            statistics_axis=norm_statistics_axis,
            shift=True, scale=True, eps=norm_eps,
            independent_axis=None, momentum=None,
        )
        self.clamp = clamp

    def _use_pallas(self):
        if self.backend == 'jnp':
            return False
        if self.window_length % self.shift:
            assert self.backend != 'pallas', (
                'Pallas frontend requires shift | window_length; '
                f'{self.window_length} % {self.shift} != 0')
            return False
        if self.backend == 'pallas':
            return True
        return jax.default_backend() == 'tpu'

    def _samples_to_frames(self, samples):
        """jit-safe (vectorized) version of STFT.samples_to_frames."""
        size, shift = self.window_length, self.shift
        fading = self._stft.fading
        if fading == 'half':
            samples = samples + (size - shift) // 2 + -(-(size - shift) // 2)
        elif fading not in (None, False):
            samples = samples + 2 * (size - shift)
        return jnp.maximum(1, -(-(samples - size + shift) // shift))

    def forward(self, audio, seq_len=None):
        """audio: (B, T_samples) or (B, 1, T_samples) float in [-1, 1]."""
        if audio.ndim == 3:
            audio = audio[:, 0]
        if self._use_pallas():
            from padertorch_tpu.ops.pallas.logmel import LogMelFrontend
            logmel = LogMelFrontend(**self._frontend_kwargs)(audio)
        else:
            spec = self._stft(audio)  # (B, frames, F, 2)
            power = spec[..., 0] ** 2 + spec[..., 1] ** 2
            logmel = jnp.log(power @ self.fbanks + 1e-12)
        y = jnp.swapaxes(logmel, -2, -1)[:, None]  # (B, 1, M, frames)
        if seq_len is not None:
            seq_len = self._samples_to_frames(jnp.asarray(seq_len))
        y = self.norm(y, sequence_lengths=seq_len)
        if self.clamp is not None:
            y = jnp.clip(y, -self.clamp, self.clamp)
        return y, seq_len
