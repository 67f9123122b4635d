"""(Fast) Griffin-Lim phase reconstruction.

Reference parity: ``contrib/mk/synthesis/parametric/griffin_lim.py:159``
(FGLA).  TPU-native: the iteration is a ``lax.scan`` over STFT/iSTFT
pairs — each iteration is two MXU convolutions, fully compiled.
"""
import jax
import jax.numpy as jnp

from padertorch_tpu.contrib.mk.synthesis.base import Synthesis
from padertorch_tpu.ops._stft import STFT

__all__ = ['GriffinLim', 'FGLA', 'reshape_complex', 'griffin_lim_step',
           'fast_griffin_lim']


def reshape_complex(signal, complex_representation):
    """Complex array -> the given ``complex_representation`` layout
    (reference parametric/griffin_lim.py:18): 'complex'/None pass
    through, 'stacked' adds a trailing [real, imag] axis, 'concat'
    concatenates real and imaginary halves on the last axis."""
    if complex_representation in (None, 'complex'):
        return signal
    if complex_representation == 'stacked':
        return jnp.stack((signal.real, signal.imag), axis=-1)
    return jnp.concatenate((signal.real, signal.imag), axis=-1)


def _to_complex(stft_signal, complex_representation):
    if complex_representation in (None, 'complex'):
        return stft_signal
    if complex_representation == 'stacked':
        return stft_signal[..., 0] + 1j * stft_signal[..., 1]
    size = stft_signal.shape[-1]
    return stft_signal[..., :size // 2] + 1j * stft_signal[..., size // 2:]


def griffin_lim_step(a, reconstruction_stft, stft):
    """One Griffin-Lim projection (reference :32): take the phase of
    the current reconstruction, impose the target magnitude ``a``,
    project onto the set of consistent spectrograms via iSTFT -> STFT.

    Returns ``(stft_signal, audio)`` with ``stft_signal`` complex
    regardless of the stft's ``complex_representation``.
    """
    rep = getattr(stft, 'complex_representation', None)
    reconstruction_angle = jnp.angle(reconstruction_stft)
    proposal_spec = a * jnp.exp(1.0j * reconstruction_angle)
    audio = stft.inverse(reshape_complex(proposal_spec, rep))
    stft_signal = _to_complex(stft(audio), rep)
    return stft_signal, audio


def fast_griffin_lim(a, stft, alpha=0.95, iterations=100, x=None,
                     key=None):
    """Functional fast Griffin-Lim (reference :77; Peer 2022): phase
    retrieval from a magnitude spectrogram with momentum ``alpha``,
    the whole iteration compiled as one ``lax.scan``.

    Args:
        a: magnitude spectrogram (..., frames, F).
        stft: an :class:`~padertorch_tpu.ops.STFT` instance.
        x: optional complex STFT initialization (e.g. from another
            phase-retrieval algorithm); random phase otherwise.

    Returns:
        The reconstructed time signal (..., T).
    """
    rep = getattr(stft, 'complex_representation', None)
    a = jnp.asarray(a)
    if x is None:
        if key is None:
            key = jax.random.PRNGKey(0)
        phase = jax.random.uniform(
            key, a.shape, minval=-jnp.pi, maxval=jnp.pi)
        x = a * jnp.exp(1.0j * phase)
    else:
        x = _to_complex(jnp.asarray(x), rep)

    def step(carry, _):
        spec, prev = carry
        projected, _ = griffin_lim_step(a, spec, stft)
        # momentum acceleration (FGLA)
        accelerated = projected + alpha * (projected - prev)
        return (accelerated, projected), None

    (spec, projected), _ = jax.lax.scan(
        step, (x, x), None, length=iterations)
    final = a * jnp.exp(1.0j * jnp.angle(projected))
    return stft.inverse(reshape_complex(final, rep))


class GriffinLim(Synthesis):
    """Reconstruct a waveform from a magnitude spectrogram.

    >>> from padertorch_tpu import random as ptrandom
    >>> import numpy as np
    >>> gl = GriffinLim(stft=STFT(64, 16, dtype='float32'), iterations=4)
    >>> x = np.random.RandomState(0).randn(2, 400).astype('float32')
    >>> mag = np.abs(np.asarray(gl.stft(x)))
    >>> y = gl(mag)
    >>> y.shape[0] == 2 and abs(y.shape[1] - 400) < 64
    True
    """

    def __init__(self, stft: STFT = None, iterations: int = 32,
                 momentum: float = 0.99, sampling_rate: int = 16000,
                 key=None):
        if stft is None:
            stft = STFT(512, 128, complex_representation='complex')
        assert stft.complex_representation == 'complex', (
            'GriffinLim needs the complex STFT representation.')
        self.stft = stft
        self.iterations = iterations
        self.momentum = momentum
        self.sampling_rate = sampling_rate
        self.key = key

    def forward(self, magnitude, sequence_lengths=None):
        """magnitude: (..., frames, F) -> time signal (..., T)."""
        key = self.key if self.key is not None else jax.random.PRNGKey(0)
        phase = jax.random.uniform(
            key, magnitude.shape, minval=-jnp.pi, maxval=jnp.pi)
        spec = magnitude * jnp.exp(1j * phase)

        def step(carry, _):
            spec, prev_update = carry
            reconstructed = self.stft(self.stft.inverse(spec))
            # fast Griffin-Lim momentum (Perraudin 2013)
            update = reconstructed + self.momentum * (
                reconstructed - prev_update)
            angles = update / jnp.maximum(jnp.abs(update), 1e-16)
            new_spec = magnitude * angles
            return (new_spec, reconstructed), None

        (spec, _), _ = jax.lax.scan(
            step, (spec, spec), None, length=self.iterations)
        return self.stft.inverse(spec)


FGLA = GriffinLim  # reference name for the fast variant
