"""Muon optimizer: trajectory equality vs an independent numpy oracle.

The oracle re-executes the published update math from scratch (Jordan
2024, modded-nanogpt):

- momentum ``mu = beta * mu + (1 - beta) * g`` with bias correction,
  nesterov blend ``mu_hat = beta * bc(mu, t+1) + (1 - beta) * bc(g, t)``
- five quintic Newton-Schulz iterations on the Frobenius-normalized
  momentum (transpose tall matrices first)
- scale by ``sqrt(max(1, n_out / n_in))``, decoupled weight decay,
  then the learning rate
- non-2D parameters fall back to AdamW

so a wiring mistake in the wrapper (or a change of semantics in the
optax backend) breaks the comparison.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

import padertorch_tpu as pt


# ------------------------------------------------------------------ #
# numpy oracle                                                        #
# ------------------------------------------------------------------ #
NS_COEFFS = (3.4445, -4.7750, 2.0315)


def _ns_orthogonalize(x, steps=5, eps=1e-8):
    x = np.asarray(x, dtype=np.float32)
    transposed = False
    if x.shape[0] > x.shape[1]:
        x = x.T
        transposed = True
    x = x / (np.linalg.norm(x) + eps)
    a, b, c = NS_COEFFS
    for _ in range(steps):
        xxt = x @ x.T
        x = a * x + (b * xxt + c * xxt @ xxt) @ x
    if transposed:
        x = x.T
    return x


def _numpy_muon_2d_step(p, g, mu, t, *, lr, beta, weight_decay, eps=1e-8):
    """One Muon update of a 2D weight. t is the 1-based step count."""
    mu = beta * mu + (1 - beta) * g
    bc_mu = mu / (1 - beta ** (t + 1))
    bc_g = g / (1 - beta ** t)
    mu_hat = beta * bc_mu + (1 - beta) * bc_g
    orth = _ns_orthogonalize(mu_hat, eps=eps)
    factor = p.shape[1] / p.shape[0]  # n_out / n_in (reduction axis 0)
    update = np.sqrt(max(1.0, factor)) * orth
    update = update + weight_decay * p
    return p - lr * update, mu


def _numpy_adamw_1d_step(p, g, m, v, t, *, lr, b1, b2, eps, weight_decay):
    # optax.contrib.muon forwards its `nesterov` flag (default True) to
    # the adamw fallback, so the oracle uses the nesterov first-moment
    # blend: bc(mu, t+1) mixed with bc(g, t).
    m = b1 * m + (1 - b1) * g
    v = b2 * v + (1 - b2) * g * g
    m_hat = b1 * m / (1 - b1 ** (t + 1)) + (1 - b1) * g / (1 - b1 ** t)
    v_hat = v / (1 - b2 ** t)
    p = p - lr * (m_hat / (np.sqrt(v_hat) + eps) + weight_decay * p)
    return p, m, v


# ------------------------------------------------------------------ #
# tests                                                               #
# ------------------------------------------------------------------ #
@pytest.fixture
def problem():
    rng = np.random.RandomState(7)
    params0 = {
        'wide': rng.randn(4, 12).astype('float32'),   # factor > 1 branch
        'tall': rng.randn(10, 3).astype('float32'),   # transpose branch
        'bias': rng.randn(6).astype('float32'),       # adam branch
    }
    grads = {k: rng.randn(*v.shape).astype('float32') * 0.3
             for k, v in params0.items()}
    return params0, grads


@pytest.mark.parametrize('weight_decay', [0.0, 0.05])
def test_muon_matches_numpy_oracle(problem, weight_decay):
    params0, grads = problem
    lr, beta, n_steps = 0.02, 0.95, 4

    opt = pt.Muon(lr=lr, beta=beta, weight_decay=weight_decay,
                  adam_weight_decay=weight_decay)
    params = jax.tree_util.tree_map(jnp.asarray, params0)
    opt.set_parameters(params)
    for i in range(n_steps):
        g = jax.tree_util.tree_map(
            lambda x: jnp.asarray(x) * (0.5 ** i), grads)
        params, _ = opt.apply(params, g)

    # oracle
    ps = {k: v.copy() for k, v in params0.items()}
    mus = {k: np.zeros_like(v) for k, v in params0.items()
           if v.ndim == 2}
    m = np.zeros_like(params0['bias'])
    v = np.zeros_like(params0['bias'])
    for i in range(n_steps):
        t = i + 1
        for k in ('wide', 'tall'):
            ps[k], mus[k] = _numpy_muon_2d_step(
                ps[k], grads[k] * (0.5 ** i), mus[k], t,
                lr=lr, beta=beta, weight_decay=weight_decay)
        ps['bias'], m, v = _numpy_adamw_1d_step(
            ps['bias'], grads['bias'] * (0.5 ** i), m, v, t,
            lr=lr, b1=0.9, b2=0.999, eps=1e-8,
            weight_decay=weight_decay)

    for k in params0:
        np.testing.assert_allclose(
            np.asarray(params[k]), ps[k], atol=2e-5, rtol=2e-5,
            err_msg=k)


def test_muon_update_is_near_orthogonal(problem):
    """After one step the 2D update direction has singular values ~1
    (the point of the optimizer: steepest descent under the spectral
    norm)."""
    params0, grads = problem
    opt = pt.Muon(lr=1.0, beta=0.95)
    params = {k: jnp.asarray(v) for k, v in params0.items()}
    opt.set_parameters(params)
    new_params, _ = opt.apply(params, {k: jnp.asarray(v)
                                       for k, v in grads.items()})
    update = np.asarray(params['wide'] - new_params['wide'])
    factor = np.sqrt(max(1.0, update.shape[1] / update.shape[0]))
    s = np.linalg.svd(update / factor, compute_uv=False)
    # quintic NS converges to sigma in ~ Uniform(0.5, 1.5), not exactly 1
    assert np.all(s > 0.3) and np.all(s < 1.8), s


def test_muon_lr_mutation_does_not_retrace(problem):
    params0, grads = problem
    opt = pt.Muon(lr=0.02)
    params = {k: jnp.asarray(v) for k, v in params0.items()}
    opt.set_parameters(params)
    assert opt.lr == pytest.approx(0.02)
    opt.lr = 0.005
    assert opt.lr == pytest.approx(0.005)
    params, _ = opt.apply(params, {k: jnp.asarray(v)
                                   for k, v in grads.items()})


def test_muon_state_dict_round_trip(problem):
    params0, grads = problem
    params = {k: jnp.asarray(v) for k, v in params0.items()}
    g = {k: jnp.asarray(v) for k, v in grads.items()}

    opt = pt.Muon(lr=0.02)
    opt.set_parameters(params)
    p1, _ = opt.apply(params, g)
    sd = jax.tree_util.tree_map(np.asarray, opt.state_dict())
    p2_direct, _ = opt.apply(p1, g)

    opt2 = pt.Muon(lr=0.02)
    opt2.set_parameters(params)
    opt2.load_state_dict(sd)
    p2_restored, _ = opt2.apply(p1, g)

    for a, b in zip(jax.tree_util.tree_leaves(p2_direct),
                    jax.tree_util.tree_leaves(p2_restored)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-7)


def test_muon_gradient_clipping(problem):
    """The wrapper's mandatory global-norm clip runs before the muon
    transform: with a tiny clip value the *reported* pre-clip norm is
    unchanged while the update still has unit-ish scale (muon
    normalizes direction, so clipping mainly affects the momentum)."""
    params0, grads = problem
    params = {k: jnp.asarray(v) for k, v in params0.items()}
    g = {k: jnp.asarray(v) for k, v in grads.items()}

    opt = pt.Muon(gradient_clipping=1e-3, lr=0.02)
    opt.set_parameters(params)
    leaves, _ = opt.clip_by_global_norm(jax.tree_util.tree_leaves(g))
    clipped_norm = float(jnp.sqrt(sum(
        jnp.sum(jnp.square(x)) for x in leaves)))
    assert clipped_norm == pytest.approx(1e-3, rel=1e-2)
    _, grad_norm = opt.apply(params, g)
    raw_norm = float(jnp.sqrt(sum(
        jnp.sum(jnp.square(x)) for x in jax.tree_util.tree_leaves(g))))
    assert float(grad_norm) == pytest.approx(raw_norm, rel=1e-5)


def test_muon_through_trainer_burn_test(tmp_path):
    """Muon trains a real (small) model through the Trainer's burn
    test (executability, determinism, loss decreases)."""
    from padertorch_tpu import random as ptrandom
    from tests.test_train.test_trainer import (
        MnistModel, get_datasets)

    ptrandom.seed(0)
    trainer = pt.Trainer(
        model=MnistModel(),
        storage_dir=tmp_path / 'exp',
        optimizer=pt.Muon(lr=0.02),
        stop_trigger=(2, 'epoch'),
    )
    tr, dt = get_datasets()
    trainer.test_run(tr, dt)
