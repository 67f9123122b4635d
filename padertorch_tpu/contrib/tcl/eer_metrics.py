"""Speaker verification metrics: EER and minDCF.

Reference parity: ``padertorch/contrib/tcl/eer_metrics.py:7,16``.
"""
import numpy as np

__all__ = ['eer', 'min_dcf', 'get_eer', 'get_dcf']


def eer(scores, labels):
    """Equal error rate from similarity scores and binary labels.

    >>> scores = [0.9, 0.8, 0.3, 0.2]
    >>> labels = [1, 1, 0, 0]
    >>> eer(scores, labels)
    0.0
    >>> round(eer([0.9, 0.3, 0.8, 0.2], [1, 0, 1, 0]), 2)
    0.0
    >>> round(eer([0.9, 0.8, 0.3, 0.2], [0, 1, 0, 1]), 2)
    0.5
    """
    scores = np.asarray(scores, dtype=float)
    labels = np.asarray(labels, dtype=int)
    order = np.argsort(-scores)
    labels_sorted = labels[order]
    n_pos = labels.sum()
    n_neg = len(labels) - n_pos
    assert n_pos > 0 and n_neg > 0, (n_pos, n_neg)
    # thresholds swept from high to low
    fa = np.cumsum(1 - labels_sorted) / n_neg  # false accepts
    fr = 1 - np.cumsum(labels_sorted) / n_pos  # false rejects
    idx = np.argmin(np.abs(fa - fr))
    return float((fa[idx] + fr[idx]) / 2)


def get_eer(scores, labels):
    """VoxSRC-convention EER (reference tcl/speaker_embeddings/
    eer_metrics.py:7): the root of ``1 - x = tpr(x)`` on the linearly
    interpolated ROC curve — here by bisection instead of
    ``scipy.brentq`` (same root to float precision, no scipy dep).

    >>> round(get_eer([0.9, 0.3, 0.8, 0.2], [1, 0, 1, 0]), 6)
    0.0
    >>> round(get_eer([0.9, 0.8, 0.3, 0.2], [0, 1, 0, 1]), 2)
    0.5
    """
    scores = np.asarray(scores, dtype=float)
    labels = np.asarray(labels, dtype=int)
    order = np.argsort(-scores)
    ls = labels[order]
    n_pos = int(ls.sum())
    n_neg = len(ls) - n_pos
    assert n_pos > 0 and n_neg > 0, (n_pos, n_neg)
    tpr = np.concatenate([[0.], np.cumsum(ls) / n_pos])
    fpr = np.concatenate([[0.], np.cumsum(1 - ls) / n_neg])

    def f(x):
        return 1. - x - np.interp(x, fpr, tpr)

    lo, hi = 0., 1.
    for _ in range(60):
        mid = (lo + hi) / 2
        if f(lo) * f(mid) <= 0:
            hi = mid
        else:
            lo = mid
    return float((lo + hi) / 2)


def get_dcf(scores, labels, p_target=0.05, c_miss=1, c_fa=1):
    """VoxSRC-convention minimum normalized detection cost (reference
    eer_metrics.py:16): ascending-score threshold sweep, vectorized.

    >>> round(get_dcf([0.9, 0.3, 0.8, 0.2], [1, 0, 1, 0]), 6)
    0.0
    """
    scores = np.asarray(scores, dtype=float)
    indices = np.argsort(scores)
    labels = np.asarray(labels).astype(np.int32)[indices]
    n_pos = int(labels.sum())
    n_neg = len(labels) - n_pos
    assert n_pos > 0 and n_neg > 0, (n_pos, n_neg)
    fnrs = np.cumsum(labels) / n_pos
    fprs = 1. - np.cumsum(1 - labels) / n_neg
    c_det = c_miss * fnrs * p_target + c_fa * fprs * (1 - p_target)
    c_def = min(c_miss * p_target, c_fa * (1 - p_target))
    return float(c_det.min() / c_def)


def min_dcf(scores, labels, p_target=0.01, c_miss=1.0, c_fa=1.0):
    """Minimum detection cost function (NIST SRE style)."""
    scores = np.asarray(scores, dtype=float)
    labels = np.asarray(labels, dtype=int)
    order = np.argsort(-scores)
    labels_sorted = labels[order]
    n_pos = labels.sum()
    n_neg = len(labels) - n_pos
    fa = np.cumsum(1 - labels_sorted) / n_neg
    fr = 1 - np.cumsum(labels_sorted) / n_pos
    dcf = c_miss * fr * p_target + c_fa * fa * (1 - p_target)
    dcf_default = min(c_miss * p_target, c_fa * (1 - p_target))
    return float(np.min(dcf) / dcf_default)
