"""STOI property tests: identity, noise monotonicity, and the
reference-parity contract (evaluation/stoi.py)."""
import numpy as np
import pytest

from padertorch_tpu.evaluation.stoi import stoi


@pytest.fixture
def speechlike():
    # broadband amplitude-modulated noise: fills all third-octave
    # bands (pure tones would leave most bands at the noise floor and
    # depress the correlation average)
    rng = np.random.RandomState(0)
    fs = 10_000
    t = np.arange(4 * fs) / fs
    env = 0.55 + 0.45 * np.sin(2 * np.pi * 4 * t)
    carrier = rng.randn(len(t))
    sig = env * carrier
    return sig / np.abs(sig).max(), fs


def test_identity_is_one(speechlike):
    x, fs = speechlike
    assert stoi(x, x, fs) > 0.999


def test_monotone_in_snr(speechlike):
    x, fs = speechlike
    rng = np.random.RandomState(1)
    noise = rng.randn(len(x))
    noise /= np.abs(noise).max()
    scores = [stoi(x, x + g * noise, fs) for g in (0.01, 0.1, 0.5, 2.0)]
    assert all(a >= b for a, b in zip(scores, scores[1:])), scores
    assert scores[0] > 0.95 and scores[-1] < 0.7, scores


def test_resampling_path(speechlike):
    x, _ = speechlike
    # feed at 16 kHz (resampled internally); identity still ~1
    from scipy.signal import resample_poly
    x16 = resample_poly(x, 16, 10)
    assert stoi(x16, x16, 16_000) > 0.999


def test_too_short_raises():
    with pytest.raises(ValueError, match='too short'):
        stoi(np.ones(1000), np.ones(1000), 10_000)
