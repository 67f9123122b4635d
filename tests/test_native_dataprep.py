"""The native (C++/ctypes) data-prep kernels must agree with their
pure-numpy/JAX fallbacks, and their pipeline consumers must use them."""
import numpy as np
import pytest

from padertorch_tpu import native
from padertorch_tpu.native import (
    NATIVE_AVAILABLE, frame_signal, mu_law_decode, mu_law_encode,
    pcm16_to_float32)


def test_native_compiled_in_this_env():
    # the image ships g++; the kernels must actually be native here
    assert NATIVE_AVAILABLE


def test_pcm16_matches_numpy():
    pcm = np.random.RandomState(0).randint(
        -32768, 32768, size=1000).astype(np.int16)
    np.testing.assert_allclose(
        pcm16_to_float32(pcm), pcm.astype(np.float32) / 32768.0,
        rtol=0, atol=0)


def test_mu_law_roundtrip_matches_device_op():
    import jax.numpy as jnp
    from padertorch_tpu.ops.mu_law import (
        mu_law_decode as jdec, mu_law_encode as jenc)
    x = np.linspace(-1, 1, 513).astype(np.float32)
    enc = mu_law_encode(x)
    want = np.asarray(jenc(jnp.asarray(x)))
    np.testing.assert_array_equal(enc, want.astype(np.uint8))
    dec = mu_law_decode(enc)
    want = np.asarray(jdec(jnp.asarray(enc.astype(np.int32))))
    np.testing.assert_allclose(dec, want, atol=1e-6)


def test_frame_signal_matches_strided_view():
    sig = np.random.RandomState(1).randn(1000).astype(np.float32)
    got = frame_signal(sig, 64, 32)
    want = np.stack([sig[i * 32:i * 32 + 64]
                     for i in range((1000 - 64) // 32 + 1)])
    np.testing.assert_array_equal(got, want)


def test_segment_axis_uses_native_framing():
    from padertorch_tpu.data.segment import segment_axis
    sig = np.arange(20, dtype=np.float32)
    got = segment_axis(sig, 6, 3, end='cut')
    assert got.dtype == np.float32
    want = np.stack([sig[i * 3:i * 3 + 6] for i in range(5)])
    np.testing.assert_array_equal(got, want)
    # padded path keeps the same semantics
    got = segment_axis(np.arange(7, dtype=np.float32), 4, 2, end='pad')
    np.testing.assert_array_equal(
        got, [[0, 1, 2, 3], [2, 3, 4, 5], [4, 5, 6, 0]])


def test_audio_reader_int16_native_decode(tmp_path):
    from scipy.io import wavfile
    from padertorch_tpu.contrib.je.data.transforms import AudioReader
    pcm = np.random.RandomState(2).randint(
        -32768, 32768, size=800).astype(np.int16)
    path = tmp_path / 'x.wav'
    wavfile.write(path, 16000, pcm)
    out = AudioReader()({'audio_path': str(path)})
    np.testing.assert_allclose(
        out['audio_data'], pcm.astype(np.float32) / 32768.0, atol=0)
    assert out['seq_len'] == 800
