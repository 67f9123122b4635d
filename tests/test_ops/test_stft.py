"""STFT tests against an independent numpy rfft oracle (mirrors the
paderbox.transform.stft algorithm: pad -> segment -> window -> rfft),
plus reconstruction and shape contracts (reference tests:
``tests/test_ops/test_stft.py``)."""
import contextlib

import numpy as np
import pytest
import scipy.signal

from padertorch_tpu.ops import STFT


def x64():
    import jax
    return jax.enable_x64(True)


def np_stft_oracle(x, size, shift, window_length=None, window='blackman',
                   fading='full', pad=True):
    """Independent STFT: zero-pad + frame + window + rfft (paderbox algo)."""
    window_length = window_length or size
    w = scipy.signal.get_window(window, window_length, fftbins=True)
    if fading == 'full':
        x = np.pad(x, [(0, 0)] * (x.ndim - 1)
                   + [(window_length - shift,) * 2])
    elif fading == 'half':
        lo = (window_length - shift) // 2
        hi = -(-(window_length - shift) // 2)
        x = np.pad(x, [(0, 0)] * (x.ndim - 1) + [(lo, hi)])
    if pad:
        if x.shape[-1] < window_length:
            x = np.pad(x, [(0, 0)] * (x.ndim - 1)
                       + [(0, window_length - x.shape[-1])])
        elif shift != 1 and (x.shape[-1] + shift - window_length) % shift:
            extra = shift - ((x.shape[-1] + shift - window_length) % shift)
            x = np.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, extra)])
    n_frames = (x.shape[-1] - window_length) // shift + 1
    frames = np.stack([
        x[..., i * shift:i * shift + window_length]
        for i in range(n_frames)
    ], axis=-2)
    return np.fft.rfft(frames * w, n=size, axis=-1)


@pytest.mark.parametrize('size,shift,window_length', [
    (512, 20, 40),
    (512, 128, None),
    (1024, 256, None),
    (64, 16, 32),
])
@pytest.mark.parametrize('fading', ['full', 'half', None])
def test_stft_matches_rfft_oracle(size, shift, window_length, fading):
    rng = np.random.RandomState(0)
    x = rng.randn(2, 203).astype(np.float64)
    with x64():
        stft = STFT(size, shift, window_length=window_length, fading=fading,
                    complex_representation='complex', dtype='float64')
        got = np.asarray(stft(x))
    expected = np_stft_oracle(
        x, size, shift, window_length=window_length, fading=fading)
    assert got.shape == expected.shape, (got.shape, expected.shape)
    np.testing.assert_allclose(got, expected, atol=1e-10)


def test_output_shapes_and_representations():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 6, 203).astype(np.float32)
    stft = STFT(512, 20, window_length=40,
                complex_representation='concat')
    assert stft(x).shape == (2, 6, 12, 514)
    stft = STFT(512, 20, window_length=40,
                complex_representation='complex')
    assert stft(x).shape == (2, 6, 12, 257)
    stft = STFT(512, 20, window_length=40,
                complex_representation='stacked')
    assert stft(x).shape == (2, 6, 12, 257, 2)


@pytest.mark.parametrize('window', ['blackman', 'hann'])
@pytest.mark.parametrize('fading', ['full', 'half'])
def test_reconstruction(window, fading):
    rng = np.random.RandomState(1)
    x = rng.randn(3, 400).astype(np.float64)
    with x64():
        stft = STFT(64, 16, window=window, fading=fading, dtype='float64')
        x_hat = np.asarray(stft.inverse(stft(x)))
    if fading == 'half':
        # 'half' fading gives only partial window coverage at the edges,
        # so perfect reconstruction holds in the interior (same as the
        # reference/paderbox behavior).
        edge = 64 - 16
        np.testing.assert_allclose(
            x_hat[..., edge:400 - edge], x[..., edge:-edge], atol=1e-10)
    else:
        np.testing.assert_allclose(x_hat[..., :400], x, atol=1e-10)


def test_reconstruction_window_length():
    rng = np.random.RandomState(1)
    x = rng.randn(2, 4, 180).astype(np.float64)
    with x64():
        stft = STFT(512, 20, window_length=40, dtype='float64',
                    complex_representation='concat')
        x_hat = np.asarray(stft.inverse(stft(x)))
    np.testing.assert_allclose(x_hat[..., :180], x, atol=1e-8)


def test_inverse_shape_from_doctest_contract():
    # reference doctest: 10 frames, size 512, shift 20, wl 40 -> 180 samples
    stft = STFT(512, 20, window_length=40,
                complex_representation='concat')
    sig = np.random.RandomState(0).rand(2, 4, 10, 514).astype(np.float32)
    out = np.asarray(stft.inverse(sig))
    assert out.shape == (2, 4, 180)


def test_frame_sample_conversions():
    stft = STFT(512, 20, window_length=40)
    assert stft.samples_to_frames(203) == 12
    # frames*shift + wl - shift, minus the 2*(wl - shift) fading pad
    assert stft.frames_to_samples(12) == 12 * 20 + 40 - 20 - 2 * (40 - 20)
    # inverse-doctest contract: 10 frames -> 180 samples
    assert stft.frames_to_samples(10) == 180
    # no fading
    stft = STFT(512, 20, window_length=40, fading=None)
    assert stft.frames_to_samples(stft.samples_to_frames(200)) >= 200 - 20
    assert stft.sample_index_to_frame_index(0) == 0


def test_jit_and_grad():
    import jax
    import jax.numpy as jnp
    stft = STFT(64, 16, complex_representation='concat')
    x = jnp.asarray(np.random.RandomState(0).randn(2, 400), dtype='float32')

    @jax.jit
    def loss(x):
        return jnp.sum(jnp.abs(stft(x)))

    g = jax.grad(loss)(x)
    assert g.shape == x.shape
    assert np.isfinite(np.asarray(g)).all()


def test_host_stft_matches_device_op():
    """HostSTFT (numpy, prefetch-thread safe) == the device conv op."""
    from padertorch_tpu.ops._stft import STFT, HostSTFT
    rng = np.random.RandomState(0)
    x = rng.randn(3, 8000).astype('float32')
    for size, shift, wl, fading, rep in [
            (512, 128, None, 'full', 'complex'),
            (512, 160, 400, None, 'stacked'),
            (1024, 256, None, 'half', 'concat')]:
        device = STFT(size, shift, window_length=wl, fading=fading,
                      complex_representation=rep, dtype='float32')
        host = HostSTFT(size, shift, window_length=wl, fading=fading,
                        complex_representation=rep, dtype='float32')
        a = np.asarray(device(x))
        b = host(x)
        assert isinstance(b, np.ndarray)
        np.testing.assert_allclose(a, b, atol=2e-4)
        ra = np.asarray(device.inverse(device(x)))
        rb = host.inverse(host(x))
        np.testing.assert_allclose(ra, rb, atol=1e-4)


def test_host_stft_roundtrip_reconstruction():
    from padertorch_tpu.ops._stft import HostSTFT
    rng = np.random.RandomState(1)
    x = rng.randn(2, 4000).astype('float32')
    stft = HostSTFT(512, 128, fading='full',
                    complex_representation='complex', dtype='float32')
    rec = stft.inverse(stft(x))[..., :4000]
    np.testing.assert_allclose(rec, x, atol=1e-4)
