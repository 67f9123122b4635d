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
    'bss_eval_sources',
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
    """Permutation-aligned SI-SDR for (K, T) estimates vs references.

    Values are ordered BY REFERENCE (matching :func:`input_si_sdr`,
    so input/output element-wise improvements pair correctly), and the
    returned permutation maps reference index -> assigned estimate
    index (``estimate[perm]`` is reference-aligned).  NOTE:
    ``linear_sum_assignment``'s raw ``col`` maps estimate -> reference;
    indexing predictions with it directly silently mispairs any
    non-involution assignment (first possible at K >= 3 — every K=2
    permutation is its own inverse, which is why tests at K=2 never
    caught it).
    """
    matrix = _pairwise(si_sdr, np.asarray(estimate),
                       np.asarray(reference))
    row, col = _permutation_align(matrix)
    inv = np.argsort(col)                  # reference -> estimate
    values = matrix[inv, np.arange(len(col))]
    if return_permutation:
        return values, inv
    return values


def input_si_sdr(observation, reference):
    """SI-SDR of the mixture against each reference: (K,)."""
    observation = np.asarray(observation)
    reference = np.asarray(reference)
    return np.array([
        si_sdr(observation, reference[k])
        for k in range(reference.shape[0])
    ])


def _bss_project(references, estimate, flen):
    """Least-squares projection of ``estimate`` onto ``flen``-tap filtered
    versions of ``references``; returns the FULL-length (n + flen - 1)
    projection, like BSS-eval (Vincent/Gribonval/Fevotte 2006; the
    algorithm of ``mir_eval.separation``'s time-invariant-filter
    decomposition).

    references: (nsrc, n); estimate: (n,).
    """
    from scipy.signal import fftconvolve
    from scipy.linalg import toeplitz
    nsrc, n = references.shape
    length = n + flen - 1
    nfft = int(2 ** np.ceil(np.log2(length)))
    sf = np.fft.fft(
        np.concatenate(
            [references, np.zeros((nsrc, flen - 1))], axis=1),
        n=nfft, axis=1)
    sef = np.fft.fft(
        np.concatenate([estimate, np.zeros(flen - 1)]), n=nfft)

    # gram matrix of delayed references: G[(i,a),(j,b)] =
    # sum_t s_i(t-a) s_j(t-b), circular correlations read off the FFT
    gram = np.zeros((nsrc * flen, nsrc * flen))
    for i in range(nsrc):
        for j in range(i, nsrc):
            ssf = np.real(np.fft.ifft(sf[i] * np.conj(sf[j])))
            block = toeplitz(
                np.concatenate([ssf[:1], ssf[-1:-flen:-1]]),
                r=ssf[:flen])
            gram[i * flen:(i + 1) * flen, j * flen:(j + 1) * flen] = block
            gram[j * flen:(j + 1) * flen, i * flen:(i + 1) * flen] = \
                block.T

    # cross terms: D[(i,a)] = sum_t s_i(t-a) e(t)
    cross = np.zeros(nsrc * flen)
    for i in range(nsrc):
        ssef = np.real(np.fft.ifft(sf[i] * np.conj(sef)))
        cross[i * flen:(i + 1) * flen] = np.concatenate(
            [ssef[:1], ssef[-1:-flen:-1]])

    try:
        coeffs = np.linalg.solve(gram, cross)
    except np.linalg.LinAlgError:
        coeffs = np.linalg.lstsq(gram, cross, rcond=None)[0]
    coeffs = coeffs.reshape(nsrc, flen)

    projection = np.zeros(length)
    for i in range(nsrc):
        projection += fftconvolve(coeffs[i], references[i])[:length]
    return projection


def _bss_decomposition(references, estimate, j, flen):
    """s_target, e_interf, e_artif of ``estimate`` against source ``j``
    (all length n + flen - 1; s_target includes the spatial-distortion
    term, matching ``bss_eval_sources`` where SDR's numerator is
    ``s_true + e_spat``)."""
    n = references.shape[1]
    s_target = _bss_project(references[j:j + 1], estimate, flen)
    p_all = _bss_project(references, estimate, flen)
    e_interf = p_all - s_target
    e_artif = -p_all
    e_artif[:n] += estimate
    return s_target, e_interf, e_artif


def _db_ratio(num, den):
    return 10 * np.log10(np.maximum(num, 1e-300)
                         / np.maximum(den, 1e-300))


def bss_eval_sources(reference, estimate, filter_length=512,
                     compute_permutation=True):
    """BSS-eval SDR/SIR/SAR with a 512-tap time-invariant distortion
    filter, semantics of ``mir_eval.separation.bss_eval_sources``
    (itself BSS Eval v3): full-length (n + flen - 1) projections and
    the permutation chosen by MAXIMUM MEAN SIR.

    Reference parity: the reference's evaluate scripts report these via
    ``pb_bss.evaluation.OutputMetrics`` -> mir_eval
    (``contrib/examples/source_separation/tasnet/evaluate.py:175-213``).

    Args:
        reference: (K, T) true sources.
        estimate: (K, T) estimated sources.

    Returns:
        (sdr, sir, sar, perm): each (K,), ordered by reference source;
        ``estimate[perm[k]]`` corresponds to ``reference[k]``.
    """
    reference = np.asarray(reference, dtype=np.float64)
    estimate = np.asarray(estimate, dtype=np.float64)
    assert reference.ndim == estimate.ndim == 2, (
        reference.shape, estimate.shape)
    assert reference.shape[1] == estimate.shape[1], (
        reference.shape, estimate.shape)
    k_est, k_ref = estimate.shape[0], reference.shape[0]

    sdr = np.empty((k_est, k_ref))
    sir = np.empty((k_est, k_ref))
    sar = np.empty((k_est, k_ref))
    for i in range(k_est):
        for j in range(k_ref):
            s_target, e_interf, e_artif = _bss_decomposition(
                reference, estimate[i], j, filter_length)
            sdr[i, j] = _db_ratio(
                np.sum(s_target ** 2),
                np.sum((e_interf + e_artif) ** 2))
            sir[i, j] = _db_ratio(
                np.sum(s_target ** 2), np.sum(e_interf ** 2))
            sar[i, j] = _db_ratio(
                np.sum((s_target + e_interf) ** 2),
                np.sum(e_artif ** 2))

    if compute_permutation and k_est == k_ref and k_est > 1:
        # mir_eval semantics: evaluate every permutation, keep the one
        # with the highest MEAN SIR
        best, best_mean = None, -np.inf
        for perm in itertools.permutations(range(k_est)):
            mean_sir = np.mean([sir[perm[j], j] for j in range(k_ref)])
            if mean_sir > best_mean:
                best, best_mean = perm, mean_sir
        perm = np.asarray(best)
    else:
        perm = np.arange(k_ref)
    idx = (perm, np.arange(k_ref))
    return sdr[idx], sir[idx], sar[idx], perm


def mir_eval_sdr(estimate, reference, filter_length=512):
    """Permutation-aligned BSS-eval SDR (dB), see
    :func:`bss_eval_sources`.

    estimate/reference: (K, T).  The distortion filter projection makes
    this metric forgiving to short time-invariant filtering, like
    ``mir_eval.separation.bss_eval_sources``.
    """
    sdr, _, _, _ = bss_eval_sources(
        reference, estimate, filter_length=filter_length)
    return sdr


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
