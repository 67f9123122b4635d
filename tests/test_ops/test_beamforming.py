"""GEV beamforming sanity: a simulated 2-mic scenario where the target
and noise come from different directions — the beamformer must improve
the SNR substantially."""
import numpy as np

from padertorch_tpu.evaluation.beamforming import (
    gev_beamforming, get_power_spectral_density_matrix, get_gev_vector,
    apply_beamforming_vector,
)
from padertorch_tpu.ops._stft import STFT


def test_gev_improves_snr():
    rng = np.random.RandomState(0)
    n, c = 16000, 4
    t_axis = np.arange(n) / 8000
    speech = np.sin(2 * np.pi * 440 * t_axis) * (
        1 + np.sin(2 * np.pi * 3 * t_axis)) / 2
    noise = rng.randn(n)

    # different steering: per-channel delays (integer samples)
    def steer(sig, delays):
        return np.stack([np.roll(sig, d) for d in delays])

    speech_img = steer(speech, [0, 1, 2, 3])
    noise_img = steer(noise, [3, 2, 1, 0]) * 0.7
    observation = speech_img + noise_img

    stft = STFT(256, 64, fading='full', complex_representation='complex',
                dtype='float64')
    obs_stft = np.asarray(stft(observation))        # (C, T, F)
    speech_stft = np.asarray(stft(speech_img))
    noise_stft = np.asarray(stft(noise_img))

    speech_mask = (np.abs(speech_stft[0]) > np.abs(noise_stft[0])
                   ).astype(float)
    noise_mask = 1.0 - speech_mask

    enhanced = gev_beamforming(obs_stft, speech_mask, noise_mask)
    enhanced_time = np.asarray(stft.inverse(enhanced))[..., :n]

    def snr(est):
        # project onto the clean speech to split signal/noise parts
        ref = speech
        alpha = est @ ref / (ref @ ref)
        res = est - alpha * ref
        return 10 * np.log10((alpha * ref @ (alpha * ref))
                             / max(res @ res, 1e-12))

    snr_in = snr(observation[0][:n])
    snr_out = snr(enhanced_time.real)
    assert snr_out > snr_in + 10, (snr_in, snr_out)


def test_psd_shapes():
    obs = np.random.RandomState(0).randn(2, 10, 5) \
        + 1j * np.random.RandomState(1).randn(2, 10, 5)
    psd = get_power_spectral_density_matrix(obs)
    assert psd.shape == (5, 2, 2)
    # hermitian
    np.testing.assert_allclose(
        psd, np.conj(np.swapaxes(psd, -1, -2)), atol=1e-12)
    w = get_gev_vector(psd, psd)
    assert w.shape == (5, 2)
    out = apply_beamforming_vector(w, obs)
    assert out.shape == (10, 5)
