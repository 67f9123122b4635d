"""Diffusion primitive tests.

The samplers are checked against the analytically optimal denoiser of
a Dirac data distribution: for data concentrated at ``mu`` the exact
noise predictor is

    eps*(x_t, t) = (x_t - sqrt(alpha_bar_t) * mu) / sqrt(1 - alpha_bar_t)

because ``x_t = sqrt(ab) mu + sqrt(1-ab) eps`` is invertible in eps.
With this oracle the implied x0 estimate is ``mu`` EXACTLY at every
step, so DDIM (eta=0) must return ``mu`` to float tolerance and DDPM's
samples must concentrate tightly around it — closed-form verification
of the update equations, not a statistical smoke test.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from padertorch_tpu.ops.diffusion import (
    DiffusionSchedule, q_sample, ddpm_sample, ddim_sample,
    timestep_embedding,
)


def _oracle(mu, schedule):
    def eps_fn(x_t, t):
        ab = jnp.take(schedule.alpha_bar, t)
        return (x_t - jnp.sqrt(ab) * mu) / jnp.sqrt(1.0 - ab)
    return eps_fn


@pytest.mark.parametrize('kind', ['linear', 'cosine'])
def test_schedule_monotone_and_bounded(kind):
    s = DiffusionSchedule(50, kind=kind)
    betas = np.asarray(s.betas)
    ab = np.asarray(s.alpha_bar)
    assert (betas > 0).all() and (betas <= 0.999).all()
    assert (np.diff(ab) < 0).all() and ab[0] < 1.0 and ab[-1] > 0.0
    # compare in log space: the cosine tail's alpha_bar underflows any
    # relative tolerance when recomputed through float32 betas
    np.testing.assert_allclose(
        np.log(ab), np.log(np.cumprod(1.0 - betas.astype('float64'))),
        rtol=0, atol=2e-3)


def test_q_sample_closed_form():
    s = DiffusionSchedule(10)
    x0 = jnp.ones((2, 3)) * 2.0
    noise = jnp.full((2, 3), 0.5)
    t = jnp.asarray([0, 9])
    x_t = np.asarray(q_sample(x0, t, noise, s))
    ab = np.asarray(s.alpha_bar)
    for i, ti in enumerate([0, 9]):
        np.testing.assert_allclose(
            x_t[i],
            np.sqrt(ab[ti]) * 2.0 + np.sqrt(1 - ab[ti]) * 0.5,
            rtol=1e-6)


def test_timestep_embedding_shape_and_range():
    emb = np.asarray(timestep_embedding(jnp.arange(5), 16))
    assert emb.shape == (5, 16)
    assert (np.abs(emb) <= 1.0 + 1e-6).all()
    # distinct steps embed distinctly
    assert np.abs(emb[0] - emb[4]).max() > 0.1


@pytest.mark.parametrize('kind', ['linear', 'cosine'])
def test_ddim_oracle_recovers_dirac_exactly(kind):
    s = DiffusionSchedule(100, kind=kind)
    mu = 1.7
    x0 = ddim_sample(
        _oracle(mu, s), (4, 8), s, jax.random.PRNGKey(0),
        num_steps=12, eta=0.0)
    np.testing.assert_allclose(np.asarray(x0), mu, atol=1e-3)


def test_ddim_full_steps_equals_strided_on_oracle():
    s = DiffusionSchedule(50)
    mu = -0.3
    full = ddim_sample(_oracle(mu, s), (2, 4), s,
                       jax.random.PRNGKey(1), eta=0.0)
    strided = ddim_sample(_oracle(mu, s), (2, 4), s,
                          jax.random.PRNGKey(1), num_steps=5, eta=0.0)
    # both must land on the Dirac point (path independence under the
    # exact oracle)
    np.testing.assert_allclose(np.asarray(full), mu, atol=1e-3)
    np.testing.assert_allclose(np.asarray(strided), mu, atol=1e-3)


def test_ddpm_oracle_concentrates_on_dirac():
    s = DiffusionSchedule(200)
    mu = 0.9
    x0 = ddpm_sample(
        _oracle(mu, s), (8, 16), s, jax.random.PRNGKey(2))
    x0 = np.asarray(x0)
    # ancestral sampling injects the posterior-chain noise; with the
    # exact oracle the terminal distribution still has mean mu and a
    # tiny variance (beta_1-scale)
    assert abs(x0.mean() - mu) < 0.05
    assert x0.std() < 0.2


def test_ddpm_clip_keeps_x0_in_range():
    s = DiffusionSchedule(50)
    mu = 0.5
    x0 = ddpm_sample(
        _oracle(mu, s), (4, 8), s, jax.random.PRNGKey(3),
        clip=(-1.0, 1.0))
    assert np.abs(np.asarray(x0)).max() <= 1.0 + 1e-4


def test_samplers_jit_once():
    """Both samplers compile as single programs (static trip counts)."""
    s = DiffusionSchedule(25)
    eps_fn = _oracle(0.0, s)

    @jax.jit
    def run(key):
        a = ddpm_sample(eps_fn, (2, 4), s, key)
        b = ddim_sample(eps_fn, (2, 4), s, key, num_steps=5)
        return a, b

    a, b = run(jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(a)).all()
    assert np.isfinite(np.asarray(b)).all()
