"""Loss tests against the reference's golden values (from its doctests and
``tests/test_ops/test_losses.py``) and against torch as an independent
oracle where available."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from padertorch_tpu.ops import (
    mse_loss, log_mse_loss, sdr_loss, si_sdr_loss, log1p_mse_loss,
    source_aggregated_sdr_loss, deep_clustering_loss, pit_loss,
    compute_pairwise_losses, pit_loss_from_loss_matrix,
    softmax_cross_entropy,
)
from padertorch_tpu.ops.losses.kl_divergence import gaussian_kl_divergence

estimate = jnp.array([[1., 2, 3], [4, 5, 6]])
target = jnp.array([[2., 3, 4], [4, 0, 6]])


def test_reference_golden_values():
    # Golden values from the reference's doctests (regression.py)
    np.testing.assert_allclose(float(mse_loss(estimate, target)),
                               9.3333, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(mse_loss(estimate, target, reduction=None)),
        [1.0, 8.3333], atol=1e-4)
    np.testing.assert_allclose(float(log_mse_loss(estimate, target)),
                               0.9208, atol=1e-4)
    np.testing.assert_allclose(float(sdr_loss(estimate, target)),
                               -6.5167, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(sdr_loss(estimate, target, reduction=None)),
        [-9.8528, -3.1806], atol=1e-4)
    np.testing.assert_allclose(float(si_sdr_loss(estimate, target)),
                               -10.7099, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(si_sdr_loss(estimate, target, reduction=None)),
        [-18.2391, -3.1806], atol=1e-4)
    np.testing.assert_allclose(float(log1p_mse_loss(estimate, target)),
                               1.2711, atol=1e-4)
    np.testing.assert_allclose(
        float(source_aggregated_sdr_loss(estimate, target)),
        -4.6133, atol=1e-4)
    # soft_sdr_max caps perfect reconstruction at the limit
    np.testing.assert_allclose(
        float(sdr_loss(target, target, soft_sdr_max=20)), -20., atol=1e-4)
    np.testing.assert_allclose(
        float(si_sdr_loss(target, target, soft_sdr_max=20)), -20.,
        atol=1e-4)
    np.testing.assert_allclose(
        float(log_mse_loss(target, target, soft_sdr_max=20)), -1.7758,
        atol=1e-4)


def test_si_sdr_against_definition():
    """SI-SDR == the numpy definition from Le Roux 2019."""
    rng = np.random.RandomState(0)
    ref = rng.randn(100)
    est = ref + 0.5

    def np_si_sdr(est, ref):
        alpha = est.dot(ref) / ref.dot(ref)
        s_t = alpha * ref
        return 10 * np.log10((s_t ** 2).sum() / ((est - s_t) ** 2).sum())

    np.testing.assert_allclose(
        float(si_sdr_loss(jnp.asarray(est), jnp.asarray(ref))),
        -np_si_sdr(est, ref), rtol=1e-5)
    # scale+offset invariance with offset_invariant=True
    np.testing.assert_allclose(
        float(si_sdr_loss(jnp.asarray(ref + 0.5), jnp.asarray(ref))),
        float(si_sdr_loss(jnp.asarray(ref * 2 + 1), jnp.asarray(ref))),
        rtol=1e-5)


def test_sdr_complex():
    est = jnp.array([1, 2 + 3j, 4j])
    tgt = jnp.array([2, 3 + 3j, 5j])
    np.testing.assert_allclose(float(sdr_loss(est, tgt)), -11.9498,
                               atol=1e-4)


def test_pit_loss_basics():
    T, K, F = 4, 2, 5
    assert float(pit_loss(jnp.ones((T, K, F)), jnp.zeros((T, K, F)), 1)) \
        == 1.0
    assert float(pit_loss(jnp.ones((K, F, T)), jnp.zeros((K, F, T)), 0)) \
        == 1.0
    assert float(pit_loss(jnp.ones(5), jnp.zeros(5), axis=0)) == 1.0
    # permutation recovery
    est = jnp.stack([jnp.ones((5, 4)), jnp.zeros((5, 4))])
    tgt = est[jnp.array([1, 0])]
    loss, perm = pit_loss(est, tgt, axis=0, return_permutation=True)
    assert float(loss) == 0.0
    assert tuple(np.asarray(perm)) == (1, 0)
    # high-dimensional
    est = jnp.ones((4, 5, 3, 10, 8))
    assert float(pit_loss(est, jnp.zeros_like(est), axis=-3)) == 1.0


def test_pit_cross_entropy():
    T, K, F = 4, 2, 5
    est, tgt = jnp.ones((T, K, F)), jnp.zeros((T, F), dtype=jnp.int32)
    np.testing.assert_allclose(
        float(pit_loss(est, tgt, 1, loss_fn='cross_entropy')),
        0.6931, atol=1e-4)
    m = compute_pairwise_losses(est, tgt, 1, loss_fn='cross_entropy')
    np.testing.assert_allclose(
        float(pit_loss_from_loss_matrix(m, reduction='sum')),
        0.6931, atol=1e-4)


def test_pit_matches_pairwise_hungarian():
    rng = np.random.RandomState(3)
    for k in [2, 3, 4]:
        est = jnp.asarray(rng.randn(10, k, 8))
        tgt = jnp.asarray(rng.randn(10, k, 8))
        direct = float(pit_loss(est, tgt, axis=1))
        matrix = compute_pairwise_losses(est, tgt, axis=1)
        via_matrix = float(pit_loss_from_loss_matrix(matrix))
        via_brute = float(pit_loss_from_loss_matrix(
            matrix, algorithm='brute_force'))
        np.testing.assert_allclose(direct, via_matrix, rtol=1e-5)
        np.testing.assert_allclose(direct, via_brute, rtol=1e-5)


def test_pit_from_loss_matrix_golden():
    score = jnp.array([[11., 10, 0], [4, 5, 10], [6, 0, 5]])
    assert float(pit_loss_from_loss_matrix(-score, reduction='sum')) == -26.
    assert float(pit_loss_from_loss_matrix(
        -score, reduction='sum', algorithm='greedy')) == -21.
    np.testing.assert_array_equal(
        np.asarray(pit_loss_from_loss_matrix(
            -score, reduction=None, algorithm='greedy')),
        [-11., -10., -0.])


def test_pit_hungarian_inside_jit():
    rng = np.random.RandomState(3)
    est = jnp.asarray(rng.randn(10, 3, 8).astype('float32'))
    tgt = jnp.asarray(rng.randn(10, 3, 8).astype('float32'))

    @jax.jit
    def f(est, tgt):
        m = compute_pairwise_losses(est, tgt, axis=1)
        return pit_loss_from_loss_matrix(m)

    @jax.jit
    def g(est, tgt):
        m = compute_pairwise_losses(est, tgt, axis=1)
        return pit_loss_from_loss_matrix(m, algorithm='brute_force')

    np.testing.assert_allclose(float(f(est, tgt)), float(g(est, tgt)),
                               rtol=1e-5)


def test_pit_gradient_flows():
    est = jnp.asarray(np.random.RandomState(0).randn(10, 2, 4),
                      dtype='float32')
    tgt = jnp.asarray(np.random.RandomState(1).randn(10, 2, 4),
                      dtype='float32')
    g = jax.grad(lambda e: pit_loss(e, tgt, axis=1))(est)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.sum(jnp.abs(g))) > 0


def test_deep_clustering_loss_vs_torch():
    torch = pytest.importorskip('torch')
    rng = np.random.RandomState(0)
    x = rng.randn(20, 5).astype(np.float32)
    x /= np.linalg.norm(x, axis=-1, keepdims=True)
    t = np.eye(3, dtype=np.float32)[rng.randint(3, size=20)]
    got = float(deep_clustering_loss(jnp.asarray(x), jnp.asarray(t)))
    # torch oracle (same formula)
    tx, tt = torch.tensor(x), torch.tensor(t)
    n = tx.shape[0]
    want = float((
        torch.sum(torch.einsum('ne,nE->eE', tx, tx) ** 2)
        - 2 * torch.sum(torch.einsum('ne,nK->eK', tx, tt) ** 2)
        + torch.sum(torch.einsum('nk,nK->kK', tt, tt) ** 2)
    ) / n ** 2)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_softmax_cross_entropy_vs_torch():
    torch = pytest.importorskip('torch')
    rng = np.random.RandomState(0)
    x = rng.randn(100, 3).astype(np.float32)
    t = rng.randint(0, 3, size=(100,))
    t[::7] = -1  # ignore index
    got = float(softmax_cross_entropy(jnp.asarray(x), jnp.asarray(t)))
    want = float(torch.nn.CrossEntropyLoss(ignore_index=-1)(
        torch.tensor(x), torch.tensor(t)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_gaussian_kl_vs_torch():
    torch = pytest.importorskip('torch')
    from torch.distributions import Normal, kl_divergence
    rng = np.random.RandomState(0)
    q_loc = rng.randn(3, 4).astype(np.float32)
    q_scale = rng.rand(3, 4).astype(np.float32) + 0.5
    p_loc = rng.randn(5, 4).astype(np.float32)
    p_scale = rng.rand(5, 4).astype(np.float32) + 0.5
    got = np.asarray(gaussian_kl_divergence(
        (jnp.asarray(q_loc), jnp.asarray(q_scale)),
        (jnp.asarray(p_loc), jnp.asarray(p_scale))))
    want = kl_divergence(
        Normal(torch.tensor(q_loc)[:, None], torch.tensor(q_scale)[:, None]),
        Normal(torch.tensor(p_loc)[None], torch.tensor(p_scale)[None]),
    ).sum(-1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_gaussian_kl_full_covariance_vs_torch():
    torch = pytest.importorskip('torch')
    from torch.distributions import Normal, MultivariateNormal, kl_divergence
    rng = np.random.RandomState(0)
    d = 3
    q_loc = rng.randn(2, d).astype(np.float64)
    q_scale = rng.rand(2, d).astype(np.float64) + 0.5
    p_loc = rng.randn(4, d).astype(np.float64)
    a = rng.randn(4, d, d)
    cov = a @ np.swapaxes(a, -1, -2) + 3 * np.eye(d)
    tril = np.linalg.cholesky(cov)
    got = np.asarray(gaussian_kl_divergence(
        (jnp.asarray(q_loc), jnp.asarray(q_scale)),
        (jnp.asarray(p_loc), jnp.asarray(tril))))
    # torch oracle: expand q to diagonal MVN and compare one by one
    want = np.zeros((2, 4))
    for b in range(2):
        for k in range(4):
            q = MultivariateNormal(
                torch.tensor(q_loc[b]),
                covariance_matrix=torch.tensor(np.diag(q_scale[b] ** 2)))
            p = MultivariateNormal(
                torch.tensor(p_loc[k]),
                scale_tril=torch.tensor(tril[k]))
            want[b, k] = float(kl_divergence(q, p))
    np.testing.assert_allclose(got, want, rtol=1e-6)
