"""STFT / iSTFT as DFT-kernel convolutions.

Reference parity: ``padertorch/ops/_stft.py`` (which numerically mirrors
``paderbox.transform.stft``): the analysis is a strided conv with a
[real; imag] windowed-DFT kernel; the synthesis is a transposed conv with
the biorthogonal window (perfect reconstruction for any window/shift pair
with sufficient overlap).  Fading ('full'/'half'), end-padding and the
three complex representations ('complex'/'concat'/'stacked') behave like
the reference.

TPU design note: a strided conv with a (2F x L) kernel is exactly one
MXU matmul per frame — XLA lowers it without custom code; a fused Pallas
variant (frame+window+DFT+mel in VMEM) lives in ``ops/pallas``.
"""
import typing
from math import ceil

import numpy as np
import jax.numpy as jnp
from jax import lax

__all__ = ['STFT', 'HostSTFT']


def _get_window(window, symmetric_window, window_length):
    """Window by name (scipy) or callable; periodic unless symmetric."""
    import scipy.signal
    if callable(window):
        if symmetric_window:
            return np.asarray(window(window_length))
        return np.asarray(window(window_length + 1))[:-1]
    return scipy.signal.get_window(
        window, window_length, fftbins=not symmetric_window)


def _roll_zeropad(a, shift):
    out = np.zeros_like(a)
    if shift == 0:
        out[:] = a
    elif shift > 0:
        out[shift:] = a[:-shift]
    else:
        out[:shift] = a[-shift:]
    return out


def _biorthogonal_window_fastest(analysis_window, shift):
    """Biorthogonal synthesis window (paderbox semantics).

    b[n] = w[n] / sum_k w[n + k*shift]^2 — perfect reconstruction dual
    window for weighted overlap-add.
    """
    size = len(analysis_window)
    influence_width = (size - 1) // shift
    denominator = np.zeros_like(analysis_window)
    sq = analysis_window ** 2
    for i in range(-influence_width, influence_width + 1):
        denominator += _roll_zeropad(sq, shift * i)
    return analysis_window / denominator


def get_stft_kernel(size, window):
    """[real; imag] windowed DFT kernel, shape (size + 2, window_length)."""
    length = len(window)
    n = np.arange(size // 2 + 1)[:, None]
    k = np.arange(length)[None, :]
    phase = -2 * np.pi / size * n * k
    real = np.cos(phase) * window[None, :]
    imag = np.sin(phase) * window[None, :]
    return np.concatenate([real, imag], axis=0)


def get_istft_kernel(size, shift, window):
    """Synthesis kernels (real, imag), each of shape (size, window_length)."""
    window = _biorthogonal_window_fastest(window, shift) / size
    length = len(window)
    f = np.arange(size)[:, None]
    n = np.arange(length)[None, :]
    kernel_real = np.cos(2 * np.pi / size * f * n) * window[None, :]
    kernel_imag = np.sin(-2 * np.pi / size * f * n) * window[None, :]
    return kernel_real, kernel_imag


def _samples_to_stft_frames(samples, size, shift, *, pad=True, fading='full'):
    if fading not in [None, False]:
        if fading == 'half':
            samples = samples + (size - shift) // 2 + ceil(
                (size - shift) / 2)
        else:
            samples = samples + 2 * (size - shift)
    if pad:
        return max(1, ceil((samples - size + shift) / shift))
    return (samples - size + shift) // shift


def _stft_frames_to_samples(frames, size, shift, fading='full'):
    samples = frames * shift + size - shift
    if fading not in [None, False]:
        pad_width = (size - shift) if fading != 'half' else (
            (size - shift) // 2 + ceil((size - shift) / 2))
        samples -= pad_width if fading == 'half' else 2 * (size - shift)
    return samples


def _sample_index_to_stft_frame_index(sample, size, shift, fading='full'):
    """Frame whose window center is nearest to ``sample``."""
    if fading in [None, False]:
        pad_width = 0
    elif fading == 'half':
        pad_width = (size - shift) // 2
    else:
        pad_width = size - shift
    center_offset = (size - 1) / 2
    frame = int(round((sample + pad_width - center_offset) / shift))
    return max(frame, 0)


class STFT:
    """STFT/iSTFT operator (see module docstring).

    >>> import numpy as np
    >>> stft = STFT(512, 20, window_length=40, \
                    complex_representation='concat')
    >>> x = jnp.asarray(np.random.RandomState(0).randn(2, 6, 203))
    >>> X = stft(x)
    >>> X.shape
    (2, 6, 12, 514)
    >>> stft = STFT(512, 20, window_length=40, \
                    complex_representation='complex')
    >>> X = stft(x)
    >>> X.shape
    (2, 6, 12, 257)
    >>> x_hat = stft.inverse(X)
    >>> x_hat.shape[-1] >= x.shape[-1]
    True
    >>> np.testing.assert_allclose(  # perfect reconstruction
    ...     x_hat[..., :203], x, atol=1e-5)
    """

    possible_out_types = ('concat', 'stacked', 'complex')

    def __init__(
            self,
            size: int = 1024,
            shift: int = 256,
            *,
            window: typing.Union[str, typing.Callable] = 'blackman',
            window_length: int = None,
            fading: typing.Optional[typing.Union[bool, str]] = 'full',
            pad: bool = True,
            symmetric_window: bool = False,
            complex_representation: str = 'complex',
            dtype=jnp.float32,
    ):
        assert complex_representation in self.possible_out_types, (
            f'Choose one of {self.possible_out_types}, '
            f'not {complex_representation}')
        self.complex_representation = complex_representation
        assert size % 2 == 0, 'Only even FFT sizes are supported.'
        self.size = size
        self.shift = shift
        self.window_length = (window_length if window_length is not None
                              else size)
        window = _get_window(
            window=window,
            symmetric_window=symmetric_window,
            window_length=self.window_length,
        )
        assert fading in [None, True, False, 'full', 'half'], fading
        self.fading = fading
        self.pad = pad
        self.dtype = dtype
        # (2F, 1, L) conv kernels (OIH layout)
        self.stft_kernel = jnp.asarray(
            get_stft_kernel(size, window), dtype=dtype)[:, None, :]
        k_real, k_imag = get_istft_kernel(size, shift, window)
        self.istft_kernel_real = jnp.asarray(k_real, dtype=dtype)[:, None, :]
        self.istft_kernel_imag = jnp.asarray(k_imag, dtype=dtype)[:, None, :]
        # numpy copies for host-side derivations (the fused
        # masked-iSTFT kernel builds its synthesis matrices from these
        # — jnp attributes would turn into tracers under jit)
        self._istft_kernel_np = (k_real, k_imag)

    @property
    def _pad_widths(self):
        if self.fading in [False, None]:
            return (0, 0)
        if self.fading == 'half':
            return (
                (self.window_length - self.shift) // 2,
                ceil((self.window_length - self.shift) / 2),
            )
        pad = self.window_length - self.shift
        return (pad, pad)

    def __call__(self, inputs):
        """[..., T] -> [..., frames, bins] (layout per representation)."""
        org_shape = inputs.shape
        stride = self.shift
        length = self.window_length
        x = inputs.reshape(-1, org_shape[-1])

        lo, hi = self._pad_widths
        if lo or hi:
            x = jnp.pad(x, ((0, 0), (lo, hi)))

        if self.pad:
            if x.shape[-1] < length:
                x = jnp.pad(x, ((0, 0), (0, length - x.shape[-1])))
            elif stride != 1 and (x.shape[-1] + stride - length) % stride:
                pad_size = stride - (
                    (x.shape[-1] + stride - length) % stride)
                x = jnp.pad(x, ((0, 0), (0, pad_size)))

        x = x[:, None, :].astype(self.dtype)  # (B, 1, T)
        encoded = lax.conv_general_dilated(
            x, self.stft_kernel,
            window_strides=(stride,),
            padding='VALID',
            dimension_numbers=('NCH', 'OIH', 'NCH'),
            preferred_element_type=self.dtype,
        )  # (B, 2F, frames)
        encoded = jnp.swapaxes(encoded, -1, -2)  # (B, frames, 2F)
        encoded = encoded.reshape(
            *org_shape[:-1], *encoded.shape[-2:])
        real, imag = jnp.split(encoded, 2, axis=-1)
        if self.complex_representation == 'stacked':
            return jnp.stack([real, imag], axis=-1)
        if self.complex_representation == 'concat':
            return jnp.concatenate([real, imag], axis=-1)
        return lax.complex(real, imag)

    def inverse(self, stft_signal):
        """Inverse STFT. Input layout per ``complex_representation``."""
        if self.complex_representation == 'stacked':
            signal_real = stft_signal[..., 0]
            signal_imag = stft_signal[..., 1]
        elif self.complex_representation == 'concat':
            signal_real, signal_imag = jnp.split(stft_signal, 2, axis=-1)
        else:
            signal_real = jnp.real(stft_signal)
            signal_imag = jnp.imag(stft_signal)
        org_shape = signal_real.shape

        def apply_kernel(signal, kernel, reflect):
            signal = signal.reshape(-1, *org_shape[-2:])
            signal = jnp.swapaxes(signal, -1, -2)  # (B, F, frames)
            tail = signal[:, 1:-1][:, ::-1]
            if reflect:
                tail = -tail
            signal = jnp.concatenate([signal, tail], axis=1)  # (B, size, fr)
            # conv_transpose1d(stride=shift), torch semantics
            return lax.conv_transpose(
                signal.astype(self.dtype),
                jnp.swapaxes(kernel, 0, 1),  # OIH -> IOH
                strides=(self.shift,),
                padding='VALID',
                dimension_numbers=('NCH', 'IOH', 'NCH'),
                transpose_kernel=True,
            )

        decoded = (
            apply_kernel(signal_real, self.istft_kernel_real, reflect=False)
            + apply_kernel(signal_imag, self.istft_kernel_imag, reflect=True)
        )  # (B, 1, T)
        time_signal = decoded[:, 0, :].reshape(
            *org_shape[:-2], decoded.shape[-1])
        if self.fading not in [None, False]:
            pad_width = self.window_length - self.shift
            if self.fading == 'half':
                pad_width /= 2
            cut_off = time_signal.shape[-1] - ceil(pad_width)
            time_signal = time_signal[..., int(pad_width):cut_off]
        return time_signal

    def masked_inverse(self, stft_signal, mask=None, backend='auto'):
        """``inverse(stft_signal * mask)`` — the separation-inference
        hot path (reference: mask-estimation models multiply the
        mixture STFT by a (..., frames, F) mask before
        ``padertorch/ops/_stft.py:176`` iSTFT) — fused into ONE Pallas
        kernel on TPU so the masked spectrogram never touches HBM
        (``ops/pallas/masked_istft.py``).

        Args:
            stft_signal: frames, layout per ``complex_representation``.
            mask: optional real mask broadcastable to
                ``(..., frames, F)`` (e.g. an extra leading source
                axis); ``None`` = plain iSTFT.
            backend: 'auto' (kernel on TPU when supported), 'pallas',
                'jnp', or 'interpret' (kernel on the CPU interpreter,
                for tests).
        """
        if backend == 'auto':
            import jax
            backend = 'pallas' if (
                self._masked_kernel_supported()
                and jax.default_backend() == 'tpu'
                and not isinstance(self, HostSTFT)) else 'jnp'
        if backend in ('pallas', 'interpret'):
            from padertorch_tpu.ops.pallas.masked_istft import (
                masked_istft)
            return masked_istft(
                stft_signal, mask, stft=self,
                interpret=backend == 'interpret')
        assert backend == 'jnp', backend
        if mask is None:
            return self.inverse(stft_signal)
        return self.inverse(self._apply_mask(stft_signal, mask))

    def _masked_kernel_supported(self):
        """Geometry the fused masked-iSTFT kernel handles (overlap-add
        groups need window_length a multiple of shift)."""
        return (self.window_length % self.shift == 0
                and self.window_length > self.shift)

    def _apply_mask(self, stft_signal, mask):
        """``stft_signal * mask`` under the object's
        ``complex_representation`` layout (mask is real, per-bin) —
        the one place this composition lives; both the device and the
        host ``masked_inverse`` jnp fallbacks delegate here."""
        xp = np if isinstance(stft_signal, np.ndarray) else jnp
        mask = xp.asarray(mask)
        if self.complex_representation == 'stacked':
            return stft_signal * mask[..., None]
        if self.complex_representation == 'concat':
            return stft_signal * xp.concatenate([mask, mask], axis=-1)
        return stft_signal * mask

    def samples_to_frames(self, samples):
        """Number of STFT frames for a number of time samples."""
        return _samples_to_stft_frames(
            samples, self.window_length, self.shift,
            pad=self.pad, fading=self.fading)

    def sample_index_to_frame_index(self, sample_index):
        """Best (center-nearest) frame index for a sample index."""
        return _sample_index_to_stft_frame_index(
            sample_index, self.window_length, self.shift,
            fading=self.fading)

    def frames_to_samples(self, frames):
        """Number of time samples for a number of STFT frames."""
        return _stft_frames_to_samples(
            frames, self.window_length, self.shift, fading=self.fading)


class HostSTFT(STFT):
    """The same transform computed with numpy on the host CPU.

    Data pipelines run in prefetch threads and must not touch the
    accelerator (feature extraction would contend with the train step
    for the chip — and remote-relay backends cannot even fetch complex
    arrays).  This subclass computes ``__call__``/``inverse`` with
    numpy using the SAME kernel matrices, so numerics match the device
    op to float32 accuracy (tested in ``tests/test_ops/test_stft.py``).
    """

    def __call__(self, inputs):
        x = np.asarray(inputs)
        org_shape = x.shape
        x = x.reshape(-1, org_shape[-1]).astype(np.float32)
        lo, hi = self._pad_widths
        if lo or hi:
            x = np.pad(x, ((0, 0), (lo, hi)))
        length, stride = self.window_length, self.shift
        if self.pad:
            if x.shape[-1] < length:
                x = np.pad(x, ((0, 0), (0, length - x.shape[-1])))
            elif stride != 1 and (x.shape[-1] + stride - length) % stride:
                x = np.pad(x, ((0, 0), (
                    0, stride - (x.shape[-1] + stride - length) % stride)))
        n_frames = (x.shape[-1] - length) // stride + 1
        frames = np.lib.stride_tricks.as_strided(
            x, (x.shape[0], n_frames, length),
            (x.strides[0], stride * x.strides[1], x.strides[1]))
        # (B, frames, 2F) — identical math to the device conv
        kernel = np.asarray(self.stft_kernel)[:, 0, :]  # (2F, L)
        encoded = frames @ kernel.T.astype(np.float32)
        encoded = encoded.reshape(*org_shape[:-1], n_frames, -1)
        real, imag = np.split(encoded, 2, axis=-1)
        if self.complex_representation == 'stacked':
            return np.stack([real, imag], axis=-1)
        if self.complex_representation == 'concat':
            return np.concatenate([real, imag], axis=-1)
        return real + 1j * imag

    def inverse(self, stft_signal):
        stft_signal = np.asarray(stft_signal)
        if self.complex_representation == 'stacked':
            real, imag = stft_signal[..., 0], stft_signal[..., 1]
        elif self.complex_representation == 'concat':
            real, imag = np.split(stft_signal, 2, axis=-1)
        else:
            real, imag = np.real(stft_signal), np.imag(stft_signal)
        org_shape = real.shape
        real = real.reshape(-1, *org_shape[-2:]).astype(np.float32)
        imag = imag.reshape(-1, *org_shape[-2:]).astype(np.float32)
        # mirror to the full spectrum (imag part reflected negated)
        real_full = np.concatenate([real, real[..., 1:-1][..., ::-1]], -1)
        imag_full = np.concatenate([imag, -imag[..., 1:-1][..., ::-1]], -1)
        k_real = np.asarray(self.istft_kernel_real)[:, 0, :]  # (size, L)
        k_imag = np.asarray(self.istft_kernel_imag)[:, 0, :]
        contrib = (real_full @ k_real.astype(np.float32)
                   + imag_full @ k_imag.astype(np.float32))  # (B, fr, L)
        batch, n_frames, length = contrib.shape
        stride = self.shift
        total = (n_frames - 1) * stride + length
        ratio = -(-length // stride)
        # grouped overlap-add: frames g, g+ratio, g+2*ratio, ... do not
        # overlap, so each group adds via one strided (reshaped) view
        out = np.zeros(
            (batch, total + ratio * stride), dtype=np.float32)
        for g in range(min(ratio, n_frames)):
            sub = contrib[:, g::ratio]  # (B, n_g, L)
            n_g = sub.shape[1]
            view = out[:, g * stride:
                       g * stride + n_g * ratio * stride]
            view = view.reshape(batch, n_g, ratio * stride)
            view[:, :, :length] += sub
        time_signal = out[:, :total].reshape(*org_shape[:-2], total)
        if self.fading not in [None, False]:
            pad_width = self.window_length - self.shift
            if self.fading == 'half':
                pad_width /= 2
            cut_off = time_signal.shape[-1] - ceil(pad_width)
            time_signal = time_signal[..., int(pad_width):cut_off]
        return time_signal

    def masked_inverse(self, stft_signal, mask=None, backend='auto'):
        """Same contract as :meth:`STFT.masked_inverse`, numpy in/out.

        Evaluation pipelines build their features with ``HostSTFT`` (the
        relay backend cannot fetch complex device arrays, and prefetch
        threads must not contend with the train step) — but the masked
        SYNTHESIS is the separation-inference hot path, so under
        ``backend='auto'`` on a TPU default backend it routes through
        the fused mask+iSTFT Pallas kernel
        (``ops/pallas/masked_istft.py``): the complex frames are split
        into a real-valued stacked layout ON THE HOST first (relays
        handle real arrays fine), synthesized on the chip, and returned
        as host numpy.  Everywhere else it is the numpy composition.
        """
        if backend == 'auto':
            import jax
            backend = 'pallas' if (
                self._masked_kernel_supported()
                and jax.default_backend() == 'tpu') else 'jnp'
        if backend in ('pallas', 'interpret'):
            spec = np.asarray(stft_signal)
            if self.complex_representation == 'stacked':
                stacked = spec
            elif self.complex_representation == 'concat':
                real, imag = np.split(spec, 2, axis=-1)
                stacked = np.stack([real, imag], axis=-1)
            else:
                stacked = np.stack(
                    [spec.real, spec.imag], axis=-1)
            twin = getattr(self, '_stacked_twin', None)
            if twin is None:
                import copy
                twin = copy.copy(self)
                twin.complex_representation = 'stacked'
                # the kernel caches its synthesis matrices on the stft
                # object it is handed; keep the twin so they persist
                self._stacked_twin = twin
            from padertorch_tpu.ops.pallas.masked_istft import masked_istft
            out = masked_istft(
                jnp.asarray(stacked.astype(np.float32)),
                None if mask is None else jnp.asarray(
                    np.asarray(mask, dtype=np.float32)),
                stft=twin, interpret=backend == 'interpret')
            return np.asarray(out)
        assert backend == 'jnp', backend
        if mask is None:
            return self.inverse(stft_signal)
        return self.inverse(
            self._apply_mask(np.asarray(stft_signal), mask))
