"""Fused masked-iSTFT kernel vs the jnp oracle (Pallas interpreter on
CPU): numerics of ``stft.inverse(spec * mask)`` must match exactly
(float32 accuracy), including fading crops, frame counts that force
block padding, broadcast source axes and every complex representation.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from padertorch_tpu.ops._stft import STFT


def _spec(stft, b, samples, seed=0):
    rng = np.random.RandomState(seed)
    x = rng.randn(b, samples).astype('float32')
    return stft(jnp.asarray(x)), x


@pytest.mark.parametrize('fading', ['full', 'half', None])
@pytest.mark.parametrize('rep', ['stacked', 'concat', 'complex'])
def test_matches_jnp_masked_inverse(fading, rep):
    stft = STFT(256, 64, window_length=256, fading=fading,
                complex_representation=rep, dtype='float32')
    spec, _ = _spec(stft, b=2, samples=2000)
    tf, f = (spec.shape[-3], spec.shape[-2]) if rep == 'stacked' else (
        spec.shape[-2],
        spec.shape[-1] // (2 if rep == 'concat' else 1))
    mask = jnp.asarray(np.random.RandomState(1).rand(
        2, tf, f).astype('float32'))

    want = np.asarray(stft.masked_inverse(spec, mask, backend='jnp'))
    got = np.asarray(
        stft.masked_inverse(spec, mask, backend='interpret'))
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_unmasked_is_perfect_reconstruction():
    stft = STFT(512, 128, fading='full',
                complex_representation='stacked', dtype='float32')
    spec, x = _spec(stft, b=3, samples=4003)  # pad path in the STFT
    got = np.asarray(stft.masked_inverse(spec, backend='interpret'))
    np.testing.assert_allclose(got[..., :4003], x, atol=1e-4)


def test_block_padding_small_frame_count():
    """tf far below the 128-frame block exercises the n_block clamp +
    frame padding path."""
    stft = STFT(128, 32, fading='full',
                complex_representation='stacked', dtype='float32')
    spec, _ = _spec(stft, b=1, samples=500)   # ~19 frames
    tf, f = spec.shape[-3], spec.shape[-2]
    mask = jnp.asarray(np.random.RandomState(2).rand(
        1, tf, f).astype('float32'))
    want = np.asarray(stft.masked_inverse(spec, mask, backend='jnp'))
    got = np.asarray(
        stft.masked_inverse(spec, mask, backend='interpret'))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_broadcast_source_axis():
    """Per-source masks (K, B, tf, F) against one (B, tf, F) mixture —
    the separation evaluate layout."""
    stft = STFT(256, 64, fading='full',
                complex_representation='stacked', dtype='float32')
    spec, _ = _spec(stft, b=2, samples=1500)
    tf, f = spec.shape[-3], spec.shape[-2]
    mask = jnp.asarray(np.random.RandomState(3).rand(
        3, 2, tf, f).astype('float32'))
    want = np.asarray(stft.masked_inverse(
        spec[None], mask, backend='jnp'))
    got = np.asarray(
        stft.masked_inverse(spec[None], mask, backend='interpret'))
    assert got.shape[:2] == (3, 2)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_rejects_unsupported_geometry():
    from padertorch_tpu.ops.pallas.masked_istft import masked_istft
    stft = STFT(512, 100, fading='full',
                complex_representation='stacked', dtype='float32')
    spec, _ = _spec(stft, b=1, samples=1000)
    with pytest.raises(ValueError, match='shift'):
        masked_istft(spec, stft=stft, interpret=True)
    flat = STFT(128, 128, fading=None,
                complex_representation='stacked', dtype='float32')
    spec2, _ = _spec(flat, b=1, samples=1024)
    with pytest.raises(ValueError, match='overlap'):
        masked_istft(spec2, stft=flat, interpret=True)
    # auto dispatch falls back to the jnp path for both
    out = stft.masked_inverse(spec, backend='auto')
    assert out.ndim == 2


@pytest.mark.parametrize('rep', ['stacked', 'concat', 'complex'])
def test_host_stft_masked_inverse_kernel_route(rep):
    """``HostSTFT.masked_inverse`` (what the evaluate recipes call) must
    produce identical results through the numpy composition and through
    the fused kernel route it takes on a TPU backend (exercised here via
    the Pallas interpreter), for every complex representation and a
    broadcast per-source mask axis."""
    from padertorch_tpu.ops._stft import HostSTFT
    stft = HostSTFT(256, 64, fading='full',
                    complex_representation=rep, dtype='float32')
    rng = np.random.RandomState(4)
    x = rng.randn(2, 1500).astype('float32')
    spec = stft(x)
    tf = spec.shape[-3] if rep == 'stacked' else spec.shape[-2]
    f = (spec.shape[-2] if rep == 'stacked'
         else spec.shape[-1] // (2 if rep == 'concat' else 1))
    mask = rng.rand(3, 2, tf, f).astype('float32')  # (K, B, tf, F)

    want = stft.masked_inverse(spec[None], mask, backend='jnp')
    got = stft.masked_inverse(spec[None], mask, backend='interpret')
    assert isinstance(got, np.ndarray)
    assert got.shape == want.shape == (3, 2, want.shape[-1])
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)
    # the kernel route must also match inverse() exactly when unmasked
    want_plain = stft.inverse(spec)
    got_plain = stft.masked_inverse(spec, backend='interpret')
    np.testing.assert_allclose(got_plain, want_plain, atol=2e-4)
    # twin is cached (the synthesis matrices persist across calls)
    assert stft._stacked_twin.complex_representation == 'stacked'


def test_host_stft_masked_inverse_matches_reference_composition():
    """The recipe path (mask -> synthesis via masked_inverse) equals the
    old hand-written mask-then-invert composition bit-for-bit on the
    numpy backend — the adoption in pit/mask_estimator/jensheit
    evaluate scripts is a pure refactor."""
    from padertorch_tpu.ops._stft import HostSTFT
    stft = HostSTFT(512, 128, fading='full',
                    complex_representation='complex', dtype='float32')
    rng = np.random.RandomState(5)
    x = rng.randn(16000).astype('float32')
    spec = stft(x)                                  # (T, F) complex
    mask = rng.rand(2, *spec.shape).astype('float32')
    old = np.asarray(stft.inverse(mask * spec[None]))
    new = stft.masked_inverse(spec, mask, backend='jnp')
    np.testing.assert_array_equal(old, new)


def test_synthesis_matrices_match_conv_kernels():
    """The window-based public constructor equals the in-place
    derivation from the STFT's conv kernels."""
    from padertorch_tpu.ops.pallas.masked_istft import (
        get_synthesis_matrices)
    from padertorch_tpu.ops._stft import _get_window
    size, shift = 256, 64
    window = _get_window('blackman', False, size)
    sr, si = get_synthesis_matrices(size, shift, window)
    stft = STFT(size, shift, fading='full',
                complex_representation='stacked', dtype='float32')
    spec, _ = _spec(stft, b=1, samples=700)
    stft.masked_inverse(spec, backend='interpret')  # caches matrices
    sr2, si2 = stft._synthesis_matrices
    np.testing.assert_allclose(sr, np.asarray(sr2), atol=1e-7)
    np.testing.assert_allclose(si, np.asarray(si2), atol=1e-7)
