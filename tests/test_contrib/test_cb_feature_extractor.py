"""cb feature-extractor variants.

Reference parity: ``padertorch/contrib/cb/feature_extractor.py`` —
``sign`` (:97), ``stft_to_cepstrum`` (:29, golden doctest values),
``AbsIPDSTFT`` (:457), ``Log1pCosSinAbsSTFT`` (:495),
``AbsRealImagSTFT`` (:527), ``ScaleIndependentCepstrum`` (:567).
"""
import numpy as np
import pytest

from padertorch_tpu.contrib.cb.feature_extractor import (
    AbsIPDSTFT, AbsRealImagSTFT, AbsSTFT, Log1pCosSinAbsSTFT,
    ScaleIndependentCepstrum, cepstrum, sign, stft_to_cepstrum,
)


class TestSign:
    def test_reference_doctest_values(self):
        out = sign([1 + 1j, 0, 1e-4])
        np.testing.assert_allclose(
            out, [0.70710678 + 0.70710678j, 0, 1.0], atol=1e-8)

    def test_eps_styles(self):
        x = np.array([0.0, 2.0])
        assert sign(x, eps_style='plus', eps=1.)[1] == 2 / 3
        assert sign(x, eps_style='max', eps=1.)[1] == 1.0
        assert sign(x, eps_style='max', eps=1.)[0] == 0.0
        with pytest.raises(ValueError):
            sign(x, eps_style='bogus')


class TestStftToCepstrum:
    def test_reference_golden_values(self):
        np.testing.assert_allclose(
            stft_to_cepstrum(np.fft.rfft([1, 2, 3, 4])),
            [2.53758691, 0.80471896, 0.45814537], atol=1e-8)
        np.testing.assert_allclose(
            stft_to_cepstrum(np.fft.rfft([1, 2, 3, 4, 5, 6, 7, 8])),
            [5.67812692, 1.21752299, 0.53177166, 0.33614941, 0.28670713],
            atol=1e-8)

    def test_matches_full_fft_formulation(self):
        x = np.random.RandomState(0).randn(16)
        full = np.fft.fft(np.log(np.abs(np.fft.fft(x))), norm='ortho')
        half = stft_to_cepstrum(np.fft.rfft(x))
        np.testing.assert_allclose(half, full.real[:9], atol=1e-8)

    def test_scale_only_hits_first_bin(self):
        spec = np.fft.rfft([1., 2, 3, 4])
        a = stft_to_cepstrum(spec)
        b = stft_to_cepstrum(spec * 2)
        np.testing.assert_allclose(a[1:], b[1:], atol=1e-10)
        assert abs(a[0] - b[0]) > 1e-3

    def test_eps_guards_zeros(self):
        out = stft_to_cepstrum([0., 0, 0])
        assert np.isfinite(out).all()
        out = stft_to_cepstrum([0., 0, 0], eps=0)
        assert not np.isfinite(out).all()

    def test_even_bins_rejected(self):
        with pytest.raises(AssertionError):
            stft_to_cepstrum(np.zeros(4))


class TestExtractorShapes:
    signal = np.random.RandomState(0).randn(6000).astype(np.float32)

    def test_abs_real_imag(self):
        fe = AbsRealImagSTFT(size=256, shift=64)
        base = AbsSTFT(size=256, shift=64)(self.signal)
        out = np.asarray(fe(self.signal))
        assert out.shape == base.shape[:-1] + (3 * base.shape[-1],)
        np.testing.assert_allclose(out[..., :129], np.asarray(base),
                                   rtol=1e-4, atol=1e-5)
        # |z|^2 == re^2 + im^2
        np.testing.assert_allclose(
            out[..., :129] ** 2,
            out[..., 129:258] ** 2 + out[..., 258:] ** 2,
            rtol=1e-3, atol=1e-4)

    def test_log1p_cos_sin(self):
        fe = Log1pCosSinAbsSTFT(size=256, shift=64)
        out = np.asarray(fe(self.signal))
        assert out.shape[-1] == 3 * 129
        cos, sin = out[..., 129:258], out[..., 258:]
        np.testing.assert_allclose(cos ** 2 + sin ** 2,
                                   np.ones_like(cos), atol=1e-4)

    def test_abs_ipd_multichannel(self):
        sig = np.random.RandomState(1).randn(3, 4000).astype(np.float32)
        fe = AbsIPDSTFT(size=256, shift=64)
        out = np.asarray(fe(sig))
        assert out.ndim == 3 and out.shape[0] == 3
        assert out.shape[-1] == 3 * 129

    def test_scale_independent_cepstrum(self):
        fe = ScaleIndependentCepstrum(size=256, shift=64)
        a = np.asarray(fe(self.signal))
        b = np.asarray(fe(self.signal * 1000))
        assert a.shape[-1] == 128  # frequencies - 1
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-4)

    def test_cepstrum_function_host_side(self):
        out = cepstrum(self.signal, size=256, shift=64)
        assert out.ndim == 2 and out.shape[-1] == 129
        assert np.isfinite(out).all()
