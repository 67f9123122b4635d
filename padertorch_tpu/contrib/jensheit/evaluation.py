"""Mask-based enhancement evaluation: masking and GEV beamforming.

Reference parity: ``padertorch/contrib/jensheit/evaluation.py``
(``evaluate_masks`` :14/:48) — apply estimated masks to a multi-channel
STFT, beamform, reconstruct time signals.  SAD (speech activity
detection) evaluation: ``eval_sad.py:65,120``.
"""
import numpy as np

from padertorch_tpu.evaluation.beamforming import (
    apply_beamforming_vector,
    get_mvdr_vector_souden,
    get_power_spectral_density_matrix,
    gev_beamforming,
)

__all__ = ['beamforming', 'evaluate_masks', 'smooth_sad', 'evaluate_sad']


def beamforming(observation, speech_mask, noise_mask,
                speech_image=None, noise_image=None,
                get_bf_fn=get_mvdr_vector_souden):
    """Mask-driven beamforming (reference jensheit/evaluation.py:14).

    Args:
        observation: (C, T, F) complex multi-channel STFT.
        speech_mask / noise_mask: (C, T, F) per-channel masks; the
            channel median is used (robust against channel outliers,
            like the reference).
        speech_image / noise_image: optional (C, T, F) oracle images
            whose beamformed contributions are returned for SNR-style
            decomposition metrics.
        get_bf_fn: ``(target_psd, noise_psd) -> (F, C)`` beamformer;
            default MVDR in Souden formulation.

    Returns:
        (speech_pred, image_contribution, noise_contribution), each
        (T, F) or None.
    """
    observation = np.asarray(observation)
    assert observation.ndim == 3, observation.shape
    speech_mask = np.median(np.asarray(speech_mask), axis=-3)
    noise_mask = np.median(np.asarray(noise_mask), axis=-3)
    speech_psd = get_power_spectral_density_matrix(
        observation, speech_mask)
    noise_psd = get_power_spectral_density_matrix(observation, noise_mask)
    bf_vec = get_bf_fn(speech_psd, noise_psd)
    speech_pred = apply_beamforming_vector(bf_vec, observation)
    image_contribution = (
        apply_beamforming_vector(bf_vec, np.asarray(speech_image))
        if speech_image is not None else None)
    noise_contribution = (
        apply_beamforming_vector(bf_vec, np.asarray(noise_image))
        if noise_image is not None else None)
    return speech_pred, image_contribution, noise_contribution


def evaluate_masks(observation_stft, speech_mask, noise_mask, stft,
                   ban=True):
    """Masked + beamformed reconstructions from masks.

    Args:
        observation_stft: (C, T, F) complex multi-channel STFT.
        speech_mask / noise_mask: (T, F).
        stft: the STFT op (for inverse).

    Returns:
        dict with 'masked' (T-domain, channel 0 masked) and
        'beamformed' (T-domain, GEV) signals.
    """
    observation_stft = np.asarray(observation_stft)
    # fused mask + synthesis (one Pallas kernel on TPU backends)
    masked = np.asarray(stft.masked_inverse(
        observation_stft[0], np.asarray(speech_mask), backend='auto'))
    beamformed_stft = gev_beamforming(
        observation_stft, speech_mask, noise_mask, ban=ban)
    beamformed = np.asarray(stft.inverse(beamformed_stft))
    return {'masked': masked, 'beamformed': beamformed}


def smooth_sad(sad, kernel=11):
    """Majority-smooth a binary SAD sequence (eval_sad.py helper)."""
    sad = np.asarray(sad, float)
    pad = kernel // 2
    padded = np.pad(sad, (pad, pad), mode='edge')
    smoothed = np.convolve(padded, np.ones(kernel) / kernel, mode='valid')
    return (smoothed > 0.5).astype(int)


def evaluate_sad(prediction, target, threshold=0.5):
    """Frame-level speech activity detection metrics.

    >>> evaluate_sad([0.9, 0.8, 0.1], [1, 1, 0])['f1']
    1.0
    """
    prediction = (np.asarray(prediction, float) >= threshold).astype(int)
    target = np.asarray(target, int)
    tp = int(((prediction == 1) & (target == 1)).sum())
    fp = int(((prediction == 1) & (target == 0)).sum())
    fn = int(((prediction == 0) & (target == 1)).sum())
    tn = int(((prediction == 0) & (target == 0)).sum())
    precision = tp / max(tp + fp, 1)
    recall = tp / max(tp + fn, 1)
    return {
        'precision': precision,
        'recall': recall,
        'f1': 2 * precision * recall / max(precision + recall, 1e-12),
        'accuracy': (tp + tn) / max(len(target), 1),
        'false_alarm_rate': fp / max(fp + tn, 1),
        'miss_rate': fn / max(fn + tp, 1),
    }
