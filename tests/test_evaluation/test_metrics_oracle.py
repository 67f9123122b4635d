"""Golden-oracle tests for ``evaluation/metrics.py`` and
``evaluation/stoi.py``.

The reference pipeline gets its headline numbers from
``pb_bss``/``mir_eval``/``pystoi``
(``/root/reference/padertorch/contrib/examples/source_separation/tasnet/
evaluate.py:175-213``).  Those libraries are not importable in this
environment, so each metric is checked against an INDEPENDENT oracle:

- **SI-SDR**: exact analytic values from an explicit orthogonal
  decomposition (the Le Roux 2019 definition has a closed form when the
  error is constructed orthogonal to the reference).
- **BSS-eval SDR/SIR/SAR**: a dense least-squares oracle — the
  ``flen``-tap projection built as an explicit delayed-source design
  matrix solved with ``np.linalg.lstsq`` — vs the production FFT/Toeplitz
  normal-equation solver.  Same math by definition
  (Vincent/Gribonval/Fevotte 2006), completely different code path.
- **STOI**: a from-scratch transcription of the published algorithm
  (Taal et al. 2011, with the pystoi framing conventions) written in a
  different style (stride-tricks framing, loop-free band matrix).

Plus analytic end-to-end cases (filtered references, known permutations,
known interference ratios).
"""
import itertools

import numpy as np
import pytest

from padertorch_tpu.evaluation.metrics import (
    si_sdr,
    input_si_sdr,
    output_si_sdr,
    mir_eval_sdr,
    bss_eval_sources,
    InputMetrics,
    OutputMetrics,
)
from padertorch_tpu.evaluation.stoi import stoi


# --------------------------------------------------------------------- #
# SI-SDR: analytic oracle                                                #
# --------------------------------------------------------------------- #
def _orthogonalize(noise, reference):
    """Component of ``noise`` orthogonal to ``reference``."""
    reference = reference / np.linalg.norm(reference)
    return noise - np.dot(noise, reference) * reference


@pytest.mark.parametrize('seed,gain,noise_scale', [
    (0, 1.0, 0.1),
    (1, 2.5, 0.01),
    (2, 0.3, 1.0),
])
def test_si_sdr_analytic(seed, gain, noise_scale):
    # estimate = gain * ref + eps * orth  ->  the scale-invariant
    # projection recovers exactly gain * ref, so
    # SI-SDR = 10 log10(gain^2 ||ref||^2 / eps^2 ||orth||^2)
    rng = np.random.RandomState(seed)
    ref = rng.randn(4000)
    orth = _orthogonalize(rng.randn(4000), ref)
    est = gain * ref + noise_scale * orth
    expected = 10 * np.log10(
        (gain ** 2 * np.sum(ref ** 2))
        / (noise_scale ** 2 * np.sum(orth ** 2)))
    np.testing.assert_allclose(si_sdr(est, ref), expected, atol=1e-9)


def test_si_sdr_scale_invariance():
    rng = np.random.RandomState(3)
    ref = rng.randn(1000)
    est = ref + 0.1 * rng.randn(1000)
    base = si_sdr(est, ref)
    for scale in (0.01, 7.3, 1e4):
        np.testing.assert_allclose(si_sdr(scale * est, ref), base,
                                   atol=1e-8)


def test_output_si_sdr_recovers_permutation():
    rng = np.random.RandomState(4)
    refs = rng.randn(3, 2000)
    # estimates are the references permuted (1, 2, 0) + small noise
    perm = [1, 2, 0]
    ests = refs[perm] + 0.01 * rng.randn(3, 2000)
    values, found = output_si_sdr(ests, refs, return_permutation=True)
    # found[j] = estimate index assigned to REFERENCE j (so
    # ests[found] is reference-aligned — the indexing OutputMetrics
    # uses; the raw assignment col would be estimate->reference and
    # silently mispair non-involutions like this 3-cycle)
    assert list(found) == list(np.argsort(perm)), found
    np.testing.assert_allclose(ests[found], refs, atol=0.05)
    assert np.all(values > 30), values


def test_input_si_sdr_mixture():
    # mixture of two orthogonalized sources: input SI-SDR of the mixture
    # against source k is 10 log10(||s_k||^2 / ||s_other||^2)
    rng = np.random.RandomState(5)
    s0 = rng.randn(3000)
    s1 = 0.5 * _orthogonalize(rng.randn(3000), s0)
    mix = s0 + s1
    got = input_si_sdr(mix, np.stack([s0, s1]))
    expected = np.array([
        10 * np.log10(np.sum(s0 ** 2) / np.sum(s1 ** 2)),
        10 * np.log10(np.sum(s1 ** 2) / np.sum(s0 ** 2)),
    ])
    np.testing.assert_allclose(got, expected, atol=1e-9)


# --------------------------------------------------------------------- #
# BSS-eval: dense least-squares oracle                                   #
# --------------------------------------------------------------------- #
def _oracle_project(references, estimate, flen):
    """Projection onto delayed references via an explicit design matrix."""
    nsrc, n = references.shape
    length = n + flen - 1
    design = np.zeros((length, nsrc * flen))
    for i in range(nsrc):
        for shift in range(flen):
            design[shift:shift + n, i * flen + shift] = references[i]
    target = np.concatenate([estimate, np.zeros(flen - 1)])
    coef, *_ = np.linalg.lstsq(design, target, rcond=None)
    return design @ coef


def _oracle_bss_eval(references, estimates, flen):
    """(sdr, sir, sar, perm), permutation by maximum mean SIR."""
    k = references.shape[0]
    n = references.shape[1]
    sdr = np.empty((k, k))
    sir = np.empty((k, k))
    sar = np.empty((k, k))
    for i in range(k):
        padded_est = np.concatenate([estimates[i], np.zeros(flen - 1)])
        for j in range(k):
            s_target = _oracle_project(
                references[j:j + 1], estimates[i], flen)
            p_all = _oracle_project(references, estimates[i], flen)
            e_interf = p_all - s_target
            e_artif = padded_est - p_all
            sdr[i, j] = 10 * np.log10(
                np.sum(s_target ** 2)
                / np.sum((e_interf + e_artif) ** 2))
            sir[i, j] = 10 * np.log10(
                np.sum(s_target ** 2) / np.sum(e_interf ** 2))
            sar[i, j] = 10 * np.log10(
                np.sum((s_target + e_interf) ** 2)
                / np.sum(e_artif ** 2))
    best = max(itertools.permutations(range(k)),
               key=lambda p: np.mean([sir[p[j], j] for j in range(k)]))
    perm = np.asarray(best)
    idx = (perm, np.arange(k))
    return sdr[idx], sir[idx], sar[idx], perm


def _make_separation_case(seed, n, leak, noise):
    """Two sources; estimates leak ``leak`` of the other source plus
    white noise -> realistic, permutation-unambiguous case."""
    rng = np.random.RandomState(seed)
    refs = rng.randn(2, n)
    ests = np.stack([
        refs[0] + leak * refs[1] + noise * rng.randn(n),
        refs[1] + leak * refs[0] + noise * rng.randn(n),
    ])
    return refs, ests


@pytest.mark.parametrize('seed,leak,noise', [
    (10, 0.3, 0.05),
    (11, 0.05, 0.2),
    (12, 0.6, 0.01),
])
def test_bss_eval_matches_dense_oracle(seed, leak, noise):
    refs, ests = _make_separation_case(seed, n=600, leak=leak,
                                       noise=noise)
    flen = 64
    sdr, sir, sar, perm = bss_eval_sources(refs, ests, flen)
    o_sdr, o_sir, o_sar, o_perm = _oracle_bss_eval(refs, ests, flen)
    np.testing.assert_array_equal(perm, o_perm)
    np.testing.assert_allclose(sdr, o_sdr, atol=1e-4)
    np.testing.assert_allclose(sir, o_sir, atol=1e-4)
    np.testing.assert_allclose(sar, o_sar, atol=1e-4)


def test_bss_eval_matches_dense_oracle_flen512():
    # the production default (mir_eval's flen=512) against the dense
    # oracle on a short utterance
    refs, ests = _make_separation_case(13, n=1600, leak=0.2, noise=0.1)
    sdr, sir, sar, perm = bss_eval_sources(refs, ests, 512)
    o_sdr, o_sir, o_sar, o_perm = _oracle_bss_eval(refs, ests, 512)
    np.testing.assert_array_equal(perm, o_perm)
    np.testing.assert_allclose(sdr, o_sdr, atol=1e-4)
    np.testing.assert_allclose(sir, o_sir, atol=1e-4)
    np.testing.assert_allclose(sar, o_sar, atol=1e-4)


def test_bss_eval_filter_invariance():
    # BSS-eval is INVARIANT to short time-invariant filtering of the
    # target: est = h * ref (8 taps << flen) has near-infinite SDR
    rng = np.random.RandomState(14)
    refs = rng.randn(2, 2000)
    refs[:, -8:] = 0  # so the truncated convolution below is exact
    h = rng.randn(8) * np.hanning(8)
    ests = np.stack([
        np.convolve(refs[0], h)[:2000],
        np.convolve(refs[1], h[::-1])[:2000],
    ])
    sdr, sir, sar, perm = bss_eval_sources(refs, ests, 512)
    assert np.all(sdr > 80), sdr
    np.testing.assert_array_equal(perm, [0, 1])
    # SI-SDR, by contrast, punishes the filtering (scale-only invariance)
    assert np.all(output_si_sdr(ests, refs) < 30)


def test_bss_eval_known_interference_ratio():
    # est_0 = ref_0 + g * ref_1 with ORTHOGONALIZED sources and no
    # noise: e_artif ~ 0 and SIR ~ 10 log10(||ref_0||^2 / g^2 ||ref_1||^2)
    rng = np.random.RandomState(15)
    s0 = rng.randn(2500)
    s1 = _orthogonalize(rng.randn(2500), s0)
    g = 0.1
    refs = np.stack([s0, s1])
    ests = np.stack([s0 + g * s1, s1 + g * s0])
    _, sir, sar, _ = bss_eval_sources(refs, ests, 16)
    expected = np.array([
        10 * np.log10(np.sum(s0 ** 2) / (g ** 2 * np.sum(s1 ** 2))),
        10 * np.log10(np.sum(s1 ** 2) / (g ** 2 * np.sum(s0 ** 2))),
    ])
    # the projection can shave a little more than plain g^2, allow 1 dB
    np.testing.assert_allclose(sir, expected, atol=1.0)
    assert np.all(sar > 60), sar  # no artifacts were added


def test_mir_eval_sdr_permutation():
    refs, ests = _make_separation_case(16, n=800, leak=0.2, noise=0.05)
    swapped = mir_eval_sdr(ests[::-1], refs, 64)
    straight = mir_eval_sdr(ests, refs, 64)
    np.testing.assert_allclose(swapped, straight, atol=1e-9)


# --------------------------------------------------------------------- #
# Input/Output metrics wrappers                                          #
# --------------------------------------------------------------------- #
def test_input_output_metrics_improvement():
    rng = np.random.RandomState(17)
    refs = rng.randn(2, 4000)
    mix = refs.sum(axis=0)
    ests = refs + 0.05 * rng.randn(2, 4000)  # a good separation
    inp = InputMetrics(mix, refs).as_dict()
    out = OutputMetrics(ests, refs).as_dict()
    assert set(inp) == {'mir_eval_sxr_sdr', 'si_sdr'}, inp.keys()
    assert set(out) == {'mir_eval_sxr_sdr', 'si_sdr'}, out.keys()
    for key in inp:
        improvement = np.asarray(out[key]) - np.asarray(inp[key])
        assert np.all(improvement > 10), (key, improvement)


def test_output_metrics_permutation_aligned():
    rng = np.random.RandomState(18)
    refs = rng.randn(2, 3000)
    ests = refs[::-1] + 0.02 * rng.randn(2, 3000)
    out = OutputMetrics(ests, refs).as_dict()
    assert np.all(np.asarray(out['si_sdr']) > 25), out
    assert np.all(np.asarray(out['mir_eval_sxr_sdr']) > 25), out


# --------------------------------------------------------------------- #
# STOI: independent transcription of Taal 2011 / pystoi conventions      #
# --------------------------------------------------------------------- #
_FS = 10_000
_FRAME = 256
_HOP = 128
_NFFT = 512
_BANDS = 15
_MINFREQ = 150.0
_SEG = 30
_BETA = -15.0
_DYN = 40.0


def _oracle_frames(x, stop_offset):
    """All hops in range(0, len(x) - 256 + stop_offset, 128)."""
    starts = np.arange(0, len(x) - _FRAME + stop_offset, _HOP)
    return np.lib.stride_tricks.sliding_window_view(
        x, _FRAME)[starts].copy()


def _oracle_stoi(x, y):
    """From-scratch STOI at 10 kHz (Taal et al. 2011; pystoi framing:
    silent-frame removal frames inclusively, the spectrogram drops the
    final frame when the hop divides evenly)."""
    w = np.hanning(_FRAME + 2)[1:-1]

    # 1. remove frames where the CLEAN signal is >40 dB below its max
    xf = _oracle_frames(x, stop_offset=1) * w
    yf = _oracle_frames(y, stop_offset=1) * w
    level = 20 * np.log10(np.linalg.norm(xf, axis=1) + 1e-16)
    keep = level > level.max() - _DYN
    xf, yf = xf[keep], yf[keep]
    x_sil = np.zeros((len(xf) + 1) * _HOP)
    y_sil = np.zeros_like(x_sil)
    for idx in range(len(xf)):
        x_sil[idx * _HOP:idx * _HOP + _FRAME] += xf[idx]
        y_sil[idx * _HOP:idx * _HOP + _FRAME] += yf[idx]

    # 2. third-octave band magnitudes
    freqs = np.arange(_NFFT // 2 + 1) * (_FS / _NFFT)
    band_idx = np.arange(_BANDS)
    low = _MINFREQ * 2.0 ** ((2 * band_idx - 1) / 6.0)
    high = _MINFREQ * 2.0 ** ((2 * band_idx + 1) / 6.0)
    # nearest-bin edges (argmin of squared distance), loop-free
    lo_bin = np.abs(freqs[None, :] - low[:, None]).argmin(axis=1)
    hi_bin = np.abs(freqs[None, :] - high[:, None]).argmin(axis=1)
    obm = ((np.arange(len(freqs))[None, :] >= lo_bin[:, None])
           & (np.arange(len(freqs))[None, :] < hi_bin[:, None])
           ).astype(float)

    def bands(sig):
        frames = _oracle_frames(sig, stop_offset=0) * w
        power = np.abs(np.fft.rfft(frames, _NFFT, axis=1)) ** 2
        return np.sqrt(np.maximum(power @ obm.T, 1e-20))

    bx, by = bands(x_sil), bands(y_sil)

    # 3. per-segment clipped, normalized band correlations
    total, count = 0.0, 0
    clip = 10 ** (-_BETA / 20)
    for stop in range(_SEG, bx.shape[0] + 1):
        seg_x = bx[stop - _SEG:stop]
        seg_y = by[stop - _SEG:stop]
        scale = (np.linalg.norm(seg_x, axis=0)
                 / (np.linalg.norm(seg_y, axis=0) + 1e-20))
        seg_y = np.minimum(seg_y * scale, seg_x * (1 + clip))
        seg_x = seg_x - seg_x.mean(axis=0)
        seg_y = seg_y - seg_y.mean(axis=0)
        corr = (seg_x * seg_y).sum(axis=0) / (
            np.linalg.norm(seg_x, axis=0)
            * np.linalg.norm(seg_y, axis=0) + 1e-20)
        total += corr.sum()
        count += corr.size
    return total / count


@pytest.fixture
def speechlike():
    rng = np.random.RandomState(20)
    t = np.arange(3 * _FS) / _FS
    env = 0.55 + 0.45 * np.sin(2 * np.pi * 4 * t)
    sig = env * rng.randn(len(t))
    return sig / np.abs(sig).max()


@pytest.mark.parametrize('seed,snr_scale', [(21, 0.1), (22, 0.5),
                                            (23, 2.0)])
def test_stoi_matches_oracle(speechlike, seed, snr_scale):
    rng = np.random.RandomState(seed)
    degraded = speechlike + snr_scale * rng.randn(len(speechlike))
    got = stoi(speechlike, degraded, _FS)
    expected = _oracle_stoi(speechlike, degraded)
    np.testing.assert_allclose(got, expected, atol=1e-10)


def test_stoi_oracle_identity(speechlike):
    assert _oracle_stoi(speechlike, speechlike) > 0.999
    np.testing.assert_allclose(
        stoi(speechlike, speechlike, _FS),
        _oracle_stoi(speechlike, speechlike), atol=1e-12)


def test_metrics_with_stoi_enabled(speechlike):
    # Input/OutputMetrics with enable_stoi route through the same stoi
    rng = np.random.RandomState(24)
    s0 = speechlike
    s1 = np.roll(speechlike, _FS) * (0.8 + 0.2 * rng.rand())
    refs = np.stack([s0, s1])
    ests = refs + 0.05 * rng.randn(*refs.shape)
    out = OutputMetrics(ests, refs, sample_rate=_FS,
                        enable_stoi=True).as_dict()
    inp = InputMetrics(refs.sum(0), refs, sample_rate=_FS,
                       enable_stoi=True).as_dict()
    assert np.all(np.asarray(out['stoi']) > np.asarray(inp['stoi']))
