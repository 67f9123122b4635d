"""Tests for summary/tbx_utils mirroring the reference's
``tests/test_summary/test_tbx_utils.py`` plus the _Colorize edge
cases from the reference doctests."""
from unittest import mock

import numpy as np
import pytest

from padertorch_tpu.summary.tbx_utils import (
    _Colorize, audio, mask_to_image, spectrogram_to_image, stft_to_image)


class TestAudio:
    def test_normalizes_to_095(self):
        sig, sr = audio(np.array([0.0, 0.5, -0.25]))
        assert sr == 16000
        np.testing.assert_allclose(np.abs(sig).max(), 0.95)

    def test_zero_signal_not_divided(self):
        sig, _ = audio(np.zeros(8))
        np.testing.assert_array_equal(sig, np.zeros(8))

    def test_no_normalize(self):
        sig, _ = audio(np.array([0.0, 0.5]), normalize=False)
        np.testing.assert_array_equal(sig, [0.0, 0.5])

    def test_complex_raises(self):
        with pytest.raises(ValueError, match='[Cc]omplex'):
            audio(np.zeros(4, dtype=np.complex64))

    def test_batch_axis(self):
        sig, _ = audio(np.ones((10, 3)), batch_first=False)
        assert sig.shape == (10,)
        sig, _ = audio(np.ones((3, 10)), batch_first=True)
        assert sig.shape == (10,)
        with pytest.raises(ValueError):
            audio(np.ones((2, 3, 4)))

    def test_sampling_rate_passthrough(self):
        _, sr = audio(np.ones(4), sampling_rate=8000)
        assert sr == 8000


class TestImages:
    def test_stft_to_image_visible_db(self):
        # reference doctest values (stft_to_image, visible_dB variants)
        data = np.array([1, 0.004, 0.003, 0.00105, 0.001])[:, None]
        img = np.squeeze(stft_to_image(data, color=None))
        np.testing.assert_array_equal(img, [255, 10, 0, 0, 0])
        img = np.squeeze(stft_to_image(data, color=None, visible_dB=60))
        np.testing.assert_array_equal(img, [255, 51, 40, 1, 0])

    def test_mask_warns_out_of_range(self):
        with pytest.warns(UserWarning, match='clipped'):
            mask_to_image(np.array([[1.5, -0.2]]))

    def test_mask_shape_and_colorize(self):
        img = mask_to_image(np.random.uniform(size=(10, 4)))
        assert img.shape == (1, 4, 10)
        img = mask_to_image(np.random.uniform(size=(10, 4)), color=True)
        assert img.shape == (4, 4, 10)  # RGBA viridis

    def test_spectrogram_origin_flip(self):
        spec = np.arange(6.0).reshape(3, 2) + 1
        up = spectrogram_to_image(spec, color=None, origin='upper')
        lo = spectrogram_to_image(spec, color=None, origin='lower')
        np.testing.assert_array_equal(up[0], lo[0, ::-1, :])

    def test_batch_first_variants(self):
        batched = np.random.uniform(size=(2, 10, 4))
        assert mask_to_image(batched, batch_first=True).shape == (1, 4, 10)
        time_major = np.random.uniform(size=(10, 2, 4))
        assert mask_to_image(time_major, batch_first=False).shape \
            == (1, 4, 10)
        with pytest.raises(ValueError):
            mask_to_image(batched, batch_first=None)


class TestColorize:
    def test_grayscale_and_color_shapes(self):
        colorize = _Colorize()
        i = np.arange(15).reshape(3, 5)
        assert colorize(i, None).shape == (1, 3, 5)
        assert colorize(i, True).shape == (4, 3, 5)

    def test_matplotlib_missing_falls_back_and_caches(self):
        colorize = _Colorize()
        i = np.arange(6).reshape(2, 3)
        with mock.patch.dict(
                'sys.modules', {'matplotlib': None,
                                'matplotlib.pyplot': None}):
            with pytest.warns(UserWarning, match='matplotlib'):
                out = colorize(i, True)
            np.testing.assert_array_equal(out, i[None])
            # second call served from the cache: no second warning
            import warnings
            with warnings.catch_warnings():
                warnings.simplefilter('error')
                out2 = colorize(i, True)
            np.testing.assert_array_equal(out2, i[None])


def test_converters_accept_bfloat16():
    """Snapshots produced under the bfloat16 trainer policy arrive as
    ml_dtypes.bfloat16 arrays; numpy's finfo/ufunc machinery does not
    treat them as inexact, so the converters coerce to float32."""
    import jax.numpy as jnp
    from padertorch_tpu.summary.tbx_utils import (
        audio, mask_to_image, spectrogram_to_image, stft_to_image)

    spec = jnp.asarray(np.abs(np.random.RandomState(0).randn(12, 5)),
                       jnp.bfloat16)
    assert spectrogram_to_image(spec, batch_first=None).shape[0] == 4
    assert stft_to_image(spec, batch_first=None).shape[0] == 4
    mask = jnp.asarray(np.random.RandomState(1).rand(12, 5), jnp.bfloat16)
    assert mask_to_image(mask, batch_first=None).shape == (1, 5, 12)
    sig, sr = audio(jnp.asarray([0.0, 0.5, -0.25], jnp.bfloat16))
    assert sr == 16000
    np.testing.assert_allclose(float(np.abs(sig).max()), 0.95)
