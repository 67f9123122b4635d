"""Beam-search decoders vs brute-force enumeration of the true model
posterior (tiny vocabularies/time axes make exact computation feasible).
"""
import itertools

import numpy as np
import pytest

from padertorch_tpu.ops.losses.ctc import (
    ctc_beam_search_decode, ctc_greedy_decode,
)
from padertorch_tpu.ops.losses.rnnt import rnnt_beam_search


# ------------------------------------------------------------------ #
# CTC                                                                  #
# ------------------------------------------------------------------ #
def _collapse(path, blank=0):
    seq, prev = [], None
    for token in path:
        if token != blank and token != prev:
            seq.append(int(token))
        prev = token
    return tuple(seq)


def _ctc_brute_force(logits, blank=0):
    """argmax_l sum over all alignments collapsing to l."""
    log_probs = logits - _lse(logits, axis=-1, keepdims=True)
    t, v = log_probs.shape
    posterior = {}
    for path in itertools.product(range(v), repeat=t):
        lp = sum(log_probs[i, k] for i, k in enumerate(path))
        label = _collapse(path, blank)
        posterior[label] = np.logaddexp(
            posterior.get(label, -np.inf), lp)
    return max(posterior, key=posterior.get), posterior


def _lse(x, axis=None, keepdims=False):
    m = np.max(x, axis=axis, keepdims=True)
    s = m + np.log(np.sum(np.exp(x - m), axis=axis, keepdims=True))
    return s if keepdims else np.squeeze(s, axis=axis)


@pytest.mark.parametrize('seed', range(8))
def test_ctc_beam_search_matches_brute_force(seed):
    rng = np.random.RandomState(seed)
    t, v = 5, 3
    logits = rng.randn(t, v).astype('float64') * 2.0
    expected, posterior = _ctc_brute_force(logits)
    got = ctc_beam_search_decode(
        logits[None], beam_width=200, prune_log_threshold=None)[0]
    assert tuple(got) == expected, (got, expected, posterior)


def test_ctc_beam_search_beats_greedy_when_they_disagree():
    """Construct the classic case: greedy picks a path whose collapsed
    label has LESS total probability than a competing label that owns
    many alignments."""
    found = False
    for seed in range(200):
        rng = np.random.RandomState(seed)
        logits = rng.randn(5, 3) * 1.5
        greedy = tuple(ctc_greedy_decode(logits[None])[0])
        expected, posterior = _ctc_brute_force(logits)
        if greedy != expected:
            beam = tuple(ctc_beam_search_decode(
                logits[None], beam_width=100,
                prune_log_threshold=None)[0])
            assert beam == expected
            assert posterior[beam] > posterior[greedy]
            found = True
            break
    assert found, 'no disagreement case found in 200 seeds'


def test_ctc_beam_search_ragged_batch():
    rng = np.random.RandomState(0)
    logits = rng.randn(2, 6, 4)
    out = ctc_beam_search_decode(
        logits, logit_lengths=np.array([6, 3]), beam_width=8)
    assert len(out) == 2
    # the second example must equal decoding its 3-frame slice alone
    alone = ctc_beam_search_decode(logits[1:2, :3], beam_width=8)[0]
    assert out[1] == alone


def test_ctc_beam_search_lm_fusion():
    """A hard LM preference flips the decode; weight 0 is a no-op."""
    rng = np.random.RandomState(3)
    logits = rng.randn(1, 5, 3) * 0.1  # nearly flat acoustics

    def lm_fn(prefix, token):
        return 0.0 if token == 2 else -10.0

    no_lm = ctc_beam_search_decode(logits, beam_width=16)[0]
    zero_w = ctc_beam_search_decode(
        logits, beam_width=16, lm_fn=lm_fn, lm_weight=0.0)[0]
    assert no_lm == zero_w
    fused = ctc_beam_search_decode(
        logits, beam_width=16, lm_fn=lm_fn, lm_weight=2.0)[0]
    assert all(token == 2 for token in fused), fused


# ------------------------------------------------------------------ #
# RNN-T                                                                #
# ------------------------------------------------------------------ #
def _make_joint(seed, v=3, e=4):
    """Deterministic toy joint: scores from a fixed random projection
    of (enc_frame, last emitted token, prefix length)."""
    rng = np.random.RandomState(seed)
    w_enc = rng.randn(e, v)
    w_tok = rng.randn(v + 1, v)   # +1 for "no token yet"
    w_len = rng.randn(6, v)

    def joint_fn(frame, prefix):
        last = prefix[-1] + 1 if len(prefix) else 0
        u = min(len(prefix), 5)
        return frame @ w_enc + w_tok[last] + w_len[u]

    return joint_fn


def _rnnt_brute_force(joint_fn, enc, u_max=4, blank=0):
    """argmax_y P(y | x) over all sequences up to length u_max, with
    P computed by the textbook alpha lattice (blank consumes a frame,
    label consumes an output slot, final blank at (T-1, U))."""
    t_len, _ = enc.shape
    v = np.asarray(joint_fn(enc[0], [])).shape[0]
    tokens = [k for k in range(v) if k != blank]

    def log_probs(t, prefix):
        scores = np.asarray(joint_fn(enc[t], list(prefix)),
                            dtype=np.float64)
        return scores - _lse(scores)

    posterior = {}
    for u_len in range(u_max + 1):
        for y in itertools.product(tokens, repeat=u_len):
            alpha = np.full((t_len, u_len + 1), -np.inf)
            alpha[0, 0] = 0.0
            for t in range(t_len):
                for u in range(u_len + 1):
                    cands = []
                    if t > 0:
                        cands.append(
                            alpha[t - 1, u]
                            + log_probs(t - 1, y[:u])[blank])
                    if u > 0:
                        cands.append(
                            alpha[t, u - 1]
                            + log_probs(t, y[:u - 1])[y[u - 1]])
                    if cands:
                        alpha[t, u] = _lse(np.asarray(cands))
            posterior[y] = alpha[t_len - 1, u_len] \
                + log_probs(t_len - 1, y)[blank]
    return max(posterior, key=posterior.get), posterior


@pytest.mark.parametrize('seed', range(6))
def test_rnnt_beam_search_matches_brute_force(seed):
    rng = np.random.RandomState(100 + seed)
    t_len, e = 3, 4
    enc = rng.randn(1, t_len, e) * 1.5
    joint_fn = _make_joint(seed, e=e)
    expected, posterior = _rnnt_brute_force(joint_fn, enc[0])
    got = rnnt_beam_search(
        joint_fn, enc, beam_width=64,
        max_symbols_per_frame=4)[0]
    assert tuple(got) == expected, (
        got, expected,
        sorted(posterior.items(), key=lambda kv: -kv[1])[:5])


def test_rnnt_beam_search_ragged_batch():
    rng = np.random.RandomState(7)
    enc = rng.randn(2, 4, 4)
    joint_fn = _make_joint(1)
    out = rnnt_beam_search(
        joint_fn, enc, logit_lengths=np.array([4, 2]), beam_width=8)
    assert len(out) == 2
    alone = rnnt_beam_search(joint_fn, enc[1:2, :2], beam_width=8)[0]
    assert out[1] == alone


@pytest.mark.parametrize('seed', range(3))
def test_rnnt_beam_search_batched_scorer_equivalent(seed):
    """joint_batch_fn (one call per expansion level) must reproduce the
    per-hypothesis path exactly."""
    rng = np.random.RandomState(200 + seed)
    enc = rng.randn(1, 3, 4) * 1.5
    joint_fn = _make_joint(seed)

    calls = {'batched': 0}

    def joint_batch_fn(frame, prefixes):
        calls['batched'] += 1
        return np.stack([joint_fn(frame, list(p)) for p in prefixes])

    ref = rnnt_beam_search(joint_fn, enc, beam_width=16,
                           max_symbols_per_frame=3)[0]
    got = rnnt_beam_search(None, enc, beam_width=16,
                           max_symbols_per_frame=3,
                           joint_batch_fn=joint_batch_fn)[0]
    assert got == ref
    assert calls['batched'] > 0
