"""STFT-domain reconstruction losses for waveform generators.

The standard auxiliary losses of neural-vocoder training (Parallel
WaveGAN, Yamamoto et al. 2020; also used by HiFi-GAN/BigVGAN-style
recipes): spectral convergence + log-STFT-magnitude, evaluated at
several STFT resolutions so the generator cannot overfit one analysis
window.

The reference (fgnt/padertorch) ships vocoder *inference* wrappers
(``contrib/mk/synthesis/vocoder``) but trains them with external
toolkits; these losses make vocoder training in-framework (see
``contrib/examples/audio_synthesis/gan_vocoder``), so they are a
beyond-reference addition.  Everything is pure XLA: the STFTs lower to
batched real-FFT matmul kernels (``ops/_stft.py``) and the loss jits
into the training step.
"""
import jax.numpy as jnp

from padertorch_tpu.ops._stft import STFT

__all__ = [
    'spectral_convergence_loss',
    'log_stft_magnitude_loss',
    'stft_magnitude_loss',
    'multi_resolution_stft_loss',
]


def _magnitude(signal, stft, eps):
    """|STFT| of a batch of waveforms: [..., T] -> [..., frames, bins]."""
    spec = stft(signal)
    return jnp.sqrt(jnp.square(spec.real) + jnp.square(spec.imag) + eps)


def spectral_convergence_loss(estimate_mag, target_mag, eps=1e-7):
    """|| |T| - |E| ||_F / || |T| ||_F over the last two axes."""
    num = jnp.sqrt(
        jnp.sum(jnp.square(target_mag - estimate_mag), axis=(-2, -1)) + eps)
    den = jnp.sqrt(jnp.sum(jnp.square(target_mag), axis=(-2, -1)) + eps)
    return jnp.mean(num / den)


def log_stft_magnitude_loss(estimate_mag, target_mag, eps=1e-7):
    """Mean L1 distance between log magnitudes."""
    return jnp.mean(jnp.abs(
        jnp.log(target_mag + eps) - jnp.log(estimate_mag + eps)))


def stft_magnitude_loss(estimate, target, *, size=1024, shift=256,
                        window_length=None, window='hann', eps=1e-7):
    """Single-resolution STFT loss: spectral convergence + log magnitude.

    Args:
        estimate, target: waveforms ``[..., T]`` (shapes must match).

    Returns:
        ``(sc_loss, mag_loss)`` pair of scalars.

    >>> import jax, numpy as np
    >>> x = jnp.asarray(np.random.RandomState(0).randn(2, 4000), 'float32')
    >>> sc, mag = stft_magnitude_loss(x, x)
    >>> bool(sc < 1e-3), bool(mag < 1e-3)
    (True, True)
    """
    stft = STFT(
        size=size, shift=shift, window=window,
        window_length=window_length or size,
        fading=None, complex_representation='complex',
    )
    est = _magnitude(estimate, stft, eps)
    tgt = _magnitude(target, stft, eps)
    return (spectral_convergence_loss(est, tgt, eps),
            log_stft_magnitude_loss(est, tgt, eps))


def multi_resolution_stft_loss(
        estimate, target, *,
        sizes=(1024, 2048, 512),
        shifts=(120, 240, 50),
        window_lengths=(600, 1200, 240),
        window='hann',
        eps=1e-7,
):
    """Multi-resolution STFT loss (Parallel WaveGAN eq. 4-6 defaults).

    Averages the single-resolution ``stft_magnitude_loss`` over the
    given resolutions.  Returns a scalar (sum of the averaged spectral
    convergence and log-magnitude terms).

    >>> import numpy as np
    >>> rng = np.random.RandomState(0)
    >>> x = jnp.asarray(rng.randn(2, 4000), 'float32')
    >>> y = jnp.asarray(rng.randn(2, 4000), 'float32')
    >>> float(multi_resolution_stft_loss(x, x)) < 1e-3
    True
    >>> float(multi_resolution_stft_loss(x, y)) > 0.5
    True
    """
    assert len(sizes) == len(shifts) == len(window_lengths), (
        sizes, shifts, window_lengths)
    sc_total = 0.0
    mag_total = 0.0
    for size, shift, wl in zip(sizes, shifts, window_lengths):
        sc, mag = stft_magnitude_loss(
            estimate, target, size=size, shift=shift,
            window_length=wl, window=window, eps=eps)
        sc_total = sc_total + sc
        mag_total = mag_total + mag
    n = len(sizes)
    return sc_total / n + mag_total / n
