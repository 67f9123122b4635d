"""Source-separation evaluation metrics (pb_bss replacement, numpy).

Native implementations of the metrics the reference's evaluate scripts get
from ``pb_bss.evaluation``:

- ``si_sdr``: scale-invariant SDR (Le Roux 2019), with optional
  permutation alignment for multi-speaker estimates.
- ``mir_eval_sdr``: BSS-eval-style SDR with a time-invariant 512-tap
  distortion filter (the projection underlying ``mir_eval``'s
  ``bss_eval_sources``), permutation-aligned.
- ``InputMetrics`` / ``OutputMetrics``: convenience wrappers that compute
  metrics for the mixture (input) and the estimate (output), so
  improvement = output - input, as in
  ``contrib/examples/source_separation/tasnet/evaluate.py:175-213``.
"""
import itertools

import numpy as np

__all__ = [
    'si_sdr',
    'input_si_sdr',
    'output_si_sdr',
    'mir_eval_sdr',
    'InputMetrics',
    'OutputMetrics',
]


def si_sdr(estimate, reference):
    """Scale-invariant SDR in dB; last axis is time, leading axes batch.

    >>> rng = np.random.RandomState(0)
    >>> ref = rng.randn(100)
    >>> float(si_sdr(ref * 2 + 1, ref)) > 6
    True
    >>> si_sdr(np.stack([ref, ref * 2]), np.stack([ref, ref])).shape
    (2,)
    """
    estimate = np.asarray(estimate, dtype=np.float64)
    reference = np.asarray(reference, dtype=np.float64)
    assert estimate.shape == reference.shape, (
        estimate.shape, reference.shape)
    alpha = (np.sum(estimate * reference, axis=-1, keepdims=True)
             / np.maximum(np.sum(reference ** 2, axis=-1, keepdims=True),
                          1e-12))
    s_target = alpha * reference
    e_noise = estimate - s_target
    return 10 * np.log10(
        np.sum(s_target ** 2, axis=-1)
        / np.maximum(np.sum(e_noise ** 2, axis=-1), 1e-12))


def _permutation_align(metric_matrix, maximize=True):
    """Best assignment for a (K_est, K_ref) metric matrix."""
    import scipy.optimize
    row, col = scipy.optimize.linear_sum_assignment(
        -metric_matrix if maximize else metric_matrix)
    return row, col


def _pairwise(metric_fn, estimate, reference):
    k_est, k_ref = estimate.shape[0], reference.shape[0]
    out = np.zeros((k_est, k_ref))
    for i in range(k_est):
        for j in range(k_ref):
            out[i, j] = metric_fn(estimate[i], reference[j])
    return out


def output_si_sdr(estimate, reference, return_permutation=False):
    """Permutation-aligned SI-SDR for (K, T) estimates vs references."""
    matrix = _pairwise(si_sdr, np.asarray(estimate),
                       np.asarray(reference))
    row, col = _permutation_align(matrix)
    values = matrix[row, col]
    if return_permutation:
        return values, col
    return values


def input_si_sdr(observation, reference):
    """SI-SDR of the mixture against each reference: (K,)."""
    observation = np.asarray(observation)
    reference = np.asarray(reference)
    return np.array([
        si_sdr(observation, reference[k])
        for k in range(reference.shape[0])
    ])


def _bss_eval_projection(reference, estimate, filter_length=512):
    """s_target via a time-invariant distortion filter (BSS eval style)."""
    from scipy.signal import fftconvolve
    n = len(reference)
    # cross/auto correlations
    lags = filter_length
    r_full = fftconvolve(reference[::-1], reference)
    c_full = fftconvolve(reference[::-1], estimate)
    center = n - 1
    # autocorrelation toeplitz matrix
    from scipy.linalg import solve_toeplitz
    r0 = r_full[center:center + lags]
    r0 = r0 + 1e-10 * np.eye(1)[0, 0] * np.arange(lags, 0, -1) * 0
    c = c_full[center:center + lags]
    try:
        h = solve_toeplitz((r_full[center:center + lags],
                            r_full[center:center + lags]), c)
    except np.linalg.LinAlgError:
        h = np.linalg.lstsq(
            _toeplitz_matrix(r_full, center, lags), c, rcond=None)[0]
    s_target = fftconvolve(reference, h)[:n]
    return s_target


def _toeplitz_matrix(r_full, center, lags):
    from scipy.linalg import toeplitz
    return toeplitz(r_full[center:center + lags])


def mir_eval_sdr(estimate, reference, filter_length=512):
    """BSS-eval-style SDR (dB) with permutation alignment.

    estimate/reference: (K, T).  The distortion filter projection makes
    this metric forgiving to short time-invariant filtering, like
    ``mir_eval.separation.bss_eval_sources``.
    """
    estimate = np.asarray(estimate, dtype=np.float64)
    reference = np.asarray(reference, dtype=np.float64)

    def single(est, ref):
        s_target = _bss_eval_projection(ref, est, filter_length)
        e = est - s_target
        return 10 * np.log10(
            np.sum(s_target ** 2)
            / np.maximum(np.sum(e ** 2), 1e-12))

    matrix = _pairwise(single, estimate, reference)
    row, col = _permutation_align(matrix)
    return matrix[row, col]


class InputMetrics:
    """Metrics of the unprocessed mixture (one row per reference speaker).

    pb_bss-API-compatible subset: ``.si_sdr``, ``.as_dict()``.
    """

    def __init__(self, observation, speech_source, sample_rate=8000,
                 enable_si_sdr=True, enable_stoi=False):
        self.observation = np.asarray(observation)
        self.speech_source = np.asarray(speech_source)
        self.sample_rate = sample_rate
        self.enable_si_sdr = enable_si_sdr
        self.enable_stoi = enable_stoi

    @property
    def si_sdr(self):
        return input_si_sdr(self.observation, self.speech_source)

    @property
    def stoi(self):
        from padertorch_tpu.evaluation.stoi import stoi
        obs = np.broadcast_to(
            self.observation, self.speech_source.shape)
        return np.asarray([
            stoi(ref, est, self.sample_rate)
            for ref, est in zip(self.speech_source, obs)])

    @property
    def mir_eval(self):
        obs = np.broadcast_to(
            self.observation, self.speech_source.shape)
        return {'sdr': mir_eval_sdr(obs, self.speech_source)}

    def as_dict(self):
        out = {'mir_eval_sxr_sdr': self.mir_eval['sdr']}
        if self.enable_si_sdr:
            out['si_sdr'] = self.si_sdr
        if self.enable_stoi:
            out['stoi'] = self.stoi
        return out


class OutputMetrics:
    """Metrics of the separated estimate, permutation-aligned."""

    def __init__(self, speech_prediction, speech_source, sample_rate=8000,
                 enable_si_sdr=True, enable_stoi=False):
        self.speech_prediction = np.asarray(speech_prediction)
        self.speech_source = np.asarray(speech_source)
        self.sample_rate = sample_rate
        self.enable_si_sdr = enable_si_sdr
        self.enable_stoi = enable_stoi

    @property
    def si_sdr(self):
        return output_si_sdr(self.speech_prediction, self.speech_source)

    @property
    def stoi(self):
        from padertorch_tpu.evaluation.stoi import stoi
        # permutation-align by SI-SDR first (like the reference)
        _, perm = output_si_sdr(
            self.speech_prediction, self.speech_source,
            return_permutation=True)
        pred = self.speech_prediction[np.asarray(perm)]
        return np.asarray([
            stoi(ref, est, self.sample_rate)
            for ref, est in zip(self.speech_source, pred)])

    @property
    def mir_eval(self):
        return {'sdr': mir_eval_sdr(
            self.speech_prediction, self.speech_source)}

    def as_dict(self):
        out = {'mir_eval_sxr_sdr': self.mir_eval['sdr']}
        if self.enable_si_sdr:
            out['si_sdr'] = self.si_sdr
        if self.enable_stoi:
            out['stoi'] = self.stoi
        return out
