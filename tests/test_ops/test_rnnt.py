"""RNN-T loss tests vs an independent numpy lattice DP oracle.

The oracle implements the textbook double loop directly (O(T*U)
python), re-derived from Graves 2012 rather than from the vectorized
implementation, so the two can only agree if both are right.  Gradients
are checked against finite differences.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from padertorch_tpu.ops.losses.rnnt import rnnt_loss, rnnt_greedy_decode


def _oracle_nll(logits, t_len, labels, u_len, blank=0):
    """Textbook forward: alpha[t, u] double loop, log-space."""
    lp = logits - np.log(np.exp(
        logits - logits.max(-1, keepdims=True)).sum(-1, keepdims=True)) \
        - logits.max(-1, keepdims=True)
    alpha = np.full((t_len, u_len + 1), -np.inf)
    alpha[0, 0] = 0.0
    for t in range(t_len):
        for u in range(u_len + 1):
            cands = []
            if t > 0:
                cands.append(alpha[t - 1, u] + lp[t - 1, u, blank])
            if u > 0:
                cands.append(alpha[t, u - 1] + lp[t, u - 1, labels[u - 1]])
            if cands:
                m = max(cands)
                if m > -np.inf:
                    alpha[t, u] = m + np.log(
                        sum(np.exp(c - m) for c in cands))
            # (t, u) == (0, 0) keeps its init
    return -(alpha[t_len - 1, u_len] + lp[t_len - 1, u_len, blank])


def test_matches_numpy_oracle_ragged_batch():
    rng = np.random.RandomState(0)
    b, t_max, u_max, v = 4, 7, 5, 6
    logits = rng.randn(b, t_max, u_max + 1, v).astype('float32')
    t_lens = np.array([7, 5, 6, 3])
    u_lens = np.array([5, 3, 0, 2])
    labels = rng.randint(1, v, (b, u_max)).astype('int32')
    nll = np.asarray(rnnt_loss(
        jnp.asarray(logits), jnp.asarray(t_lens), jnp.asarray(labels),
        jnp.asarray(u_lens)))
    for i in range(b):
        expected = _oracle_nll(
            logits[i], int(t_lens[i]), labels[i], int(u_lens[i]))
        np.testing.assert_allclose(nll[i], expected, rtol=1e-4,
                                   err_msg=f'example {i}')


def test_nonzero_blank_id():
    rng = np.random.RandomState(1)
    t_max, u_max, v = 5, 3, 4
    logits = rng.randn(1, t_max, u_max + 1, v).astype('float32')
    labels = np.array([[0, 2, 3]], dtype='int32')  # 0 is a real token
    nll = np.asarray(rnnt_loss(
        jnp.asarray(logits), jnp.array([5]), jnp.asarray(labels),
        jnp.array([3]), blank=1))
    expected = _oracle_nll(logits[0], 5, labels[0], 3, blank=1)
    np.testing.assert_allclose(nll[0], expected, rtol=1e-4)


def test_gradients_match_finite_differences():
    rng = np.random.RandomState(2)
    t_max, u_max, v = 4, 2, 3
    logits = rng.randn(1, t_max, u_max + 1, v).astype('float64')
    labels = jnp.array([[1, 2]])

    def f(x):
        return rnnt_loss(x, jnp.array([4]), labels, jnp.array([2]))[0]

    with jax.enable_x64(True):
        g = np.asarray(jax.grad(f)(jnp.asarray(logits)))
        eps = 1e-6
        for idx in [(0, 0, 0, 0), (0, 1, 1, 2), (0, 3, 2, 0),
                    (0, 2, 0, 1)]:
            plus = logits.copy()
            plus[idx] += eps
            minus = logits.copy()
            minus[idx] -= eps
            fd = (float(f(jnp.asarray(plus)))
                  - float(f(jnp.asarray(minus)))) / (2 * eps)
            np.testing.assert_allclose(g[idx], fd, rtol=1e-4, atol=1e-7,
                                       err_msg=str(idx))


def test_gradients_finite_under_length_masking():
    rng = np.random.RandomState(3)
    logits = rng.randn(2, 6, 4, 5).astype('float32')
    labels = jnp.array([[1, 2, 3], [4, 0, 0]], dtype='int32')

    def total(x):
        return jnp.sum(rnnt_loss(
            x, jnp.array([6, 3]), labels, jnp.array([3, 1])))

    g = np.asarray(jax.grad(total)(jnp.asarray(logits)))
    assert np.isfinite(g).all()
    # padded-label frames of example 1 must not receive gradient
    # through the label transitions they cannot take: the loss itself
    # must not change when padded labels change
    labels2 = jnp.array([[1, 2, 3], [4, 3, 2]], dtype='int32')
    l1 = float(total(jnp.asarray(logits)))
    l2 = float(jnp.sum(rnnt_loss(
        jnp.asarray(logits), jnp.array([6, 3]), labels2,
        jnp.array([3, 1]))))
    assert abs(l1 - l2) < 1e-5


def test_perfect_logits_drive_nll_to_zero():
    """A joint that puts all mass on the correct next symbol yields
    probability ~1 for the target sequence."""
    t_max, u_max, v = 5, 3, 4
    labels = np.array([[1, 2, 3]], dtype='int32')
    logits = np.zeros((1, t_max, u_max + 1, v), 'float32')
    big = 50.0
    # at (t, u): if u < U emit label u, else emit blank
    for t in range(t_max):
        for u in range(u_max + 1):
            target = labels[0, u] if u < u_max else 0
            logits[0, t, u, target] = big
    nll = float(rnnt_loss(
        jnp.asarray(logits), jnp.array([t_max]), jnp.asarray(labels),
        jnp.array([u_max]))[0])
    assert nll < 1e-3, nll


def test_greedy_decode_recovers_argmax_path():
    v, e = 5, 3
    # joint: scores depend only on how many labels were emitted —
    # emit 2, then 4, then blanks forever
    plan = [2, 4]

    def joint_fn(frame, prefix):
        scores = np.zeros(v)
        if len(prefix) < len(plan):
            scores[plan[len(prefix)]] = 5.0
        return scores

    enc = np.zeros((2, 4, e), 'float32')
    hyps = rnnt_greedy_decode(joint_fn, enc, logit_lengths=[4, 2])
    assert hyps == [[2, 4], [2, 4]]


def test_jit_and_vmap_compatible():
    rng = np.random.RandomState(4)
    logits = rng.randn(2, 5, 3, 4).astype('float32')
    labels = jnp.array([[1, 2], [3, 1]], dtype='int32')
    fn = jax.jit(lambda x: rnnt_loss(
        x, jnp.array([5, 4]), labels, jnp.array([2, 1])))
    np.testing.assert_allclose(
        np.asarray(fn(jnp.asarray(logits))),
        np.asarray(rnnt_loss(
            jnp.asarray(logits), jnp.array([5, 4]), labels,
            jnp.array([2, 1]))),
        rtol=1e-6)
