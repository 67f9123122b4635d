"""(Fast) Griffin-Lim phase reconstruction.

Reference parity: ``contrib/mk/synthesis/parametric/griffin_lim.py:159``
(FGLA).  TPU-native: the iteration is a ``lax.scan`` over STFT/iSTFT
pairs — each iteration is two MXU convolutions, fully compiled.
"""
import jax
import jax.numpy as jnp

from padertorch_tpu.contrib.mk.synthesis.base import Synthesis
from padertorch_tpu.ops._stft import STFT

__all__ = ['GriffinLim', 'FGLA']


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
