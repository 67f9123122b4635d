"""BASELINE.json numerics parity: repo vs torch re-execution of the
reference math, to 1e-4 (see ``padertorch_tpu/testing/parity.py``)."""
import pytest

torch = pytest.importorskip('torch')

from padertorch_tpu.testing import parity  # noqa: E402


def test_pit_loss_parity():
    result = parity.pit_parity(b=3, t=30, f=65, k=2, units=32, layers=2)
    assert result['max_abs_diff'] < 1e-4, result


def test_pit_loss_parity_three_speakers():
    result = parity.pit_parity(b=2, t=20, f=33, k=3, units=16, layers=1)
    assert result['max_abs_diff'] < 1e-4, result


@pytest.mark.parametrize('fading', ['full', 'half'])
def test_stft_parity(fading):
    assert parity.stft_parity(fading=fading) < 1e-4


def test_stft_parity_asymmetric_window():
    assert parity.stft_parity(
        size=1024, shift=200, window_length=800, window='hann') < 1e-4


def test_si_sdr_parity():
    assert parity.si_sdr_parity() < 1e-6
