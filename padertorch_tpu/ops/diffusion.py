"""Denoising diffusion (DDPM/DDIM) primitives, TPU-shaped.

Beyond-reference capability (fgnt/padertorch has no diffusion models):
the standard epsilon-prediction diffusion toolkit — variance schedules,
the closed-form forward corruption ``q(x_t | x_0)``, and ancestral
(DDPM, Ho et al. 2020) / accelerated deterministic (DDIM, Song et al.
2021) samplers.

TPU design: schedules are precomputed host-side into small constant
arrays; both samplers run the ENTIRE reverse process as one
``lax.scan`` with a static trip count, so a full synthesis — hundreds
of network evaluations — compiles to a single XLA program with no host
round-trips, exactly like the framework's autoregressive generation
loops (``contrib/mk/modules/transformer.autoregressive_generate``).

The samplers are verified against the analytically known optimal
denoiser of a Dirac data distribution (``tests/test_ops/
test_diffusion.py``): with the exact ``eps(x_t, t)`` of data
concentrated at ``mu``, DDIM recovers ``mu`` exactly and DDPM
concentrates around it — a closed-form oracle, not a statistical test.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    'DiffusionSchedule', 'q_sample', 'ddpm_sample', 'ddim_sample',
    'timestep_embedding',
]


class DiffusionSchedule:
    """Precomputed variance schedule.

    Args:
        num_steps: number of diffusion steps ``T``.
        kind: ``'linear'`` (Ho et al. 2020: beta linear in t) or
            ``'cosine'`` (Nichol & Dhariwal 2021: alpha_bar follows a
            squared cosine, betas clipped to 0.999).
        beta_start, beta_end: linear schedule endpoints.

    Attributes (all float32 arrays of shape ``(T,)``):
        betas, alphas, alpha_bar, sqrt_alpha_bar,
        sqrt_one_minus_alpha_bar.

    >>> s = DiffusionSchedule(10)
    >>> s.betas.shape, float(s.alpha_bar[-1]) < float(s.alpha_bar[0])
    ((10,), True)
    >>> c = DiffusionSchedule(10, kind='cosine')
    >>> bool((c.betas <= 0.999).all() and (c.betas > 0).all())
    True
    """

    def __init__(self, num_steps, kind='linear', beta_start=1e-4,
                 beta_end=0.02):
        self.num_steps = int(num_steps)
        if kind == 'linear':
            betas = np.linspace(
                beta_start, beta_end, self.num_steps, dtype='float64')
        elif kind == 'cosine':
            def f(u):
                return np.cos((u + 0.008) / 1.008 * math.pi / 2) ** 2
            u = np.arange(self.num_steps + 1) / self.num_steps
            alpha_bar = f(u) / f(0.0)
            betas = np.clip(
                1.0 - alpha_bar[1:] / alpha_bar[:-1], 0.0, 0.999)
        else:
            raise ValueError(f'unknown schedule kind: {kind!r}')
        alphas = 1.0 - betas
        alpha_bar = np.cumprod(alphas)
        self.kind = kind
        self.betas = jnp.asarray(betas, dtype='float32')
        self.alphas = jnp.asarray(alphas, dtype='float32')
        self.alpha_bar = jnp.asarray(alpha_bar, dtype='float32')
        self.sqrt_alpha_bar = jnp.sqrt(self.alpha_bar)
        self.sqrt_one_minus_alpha_bar = jnp.sqrt(1.0 - self.alpha_bar)


def _gather(a, t, ndim):
    """Schedule value at step(s) ``t``, broadcast to ``ndim`` dims."""
    g = jnp.take(a, t)
    return g.reshape(g.shape + (1,) * (ndim - g.ndim))


def q_sample(x0, t, noise, schedule):
    """Forward corruption ``q(x_t | x_0)`` in closed form.

    ``x_t = sqrt(alpha_bar_t) * x_0 + sqrt(1 - alpha_bar_t) * eps``.

    Args:
        x0: clean data, any shape with leading batch axis.
        t: int32 step indices, shape ``()`` or ``(B,)``.
        noise: standard normal, same shape as ``x0``.
        schedule: a :class:`DiffusionSchedule`.
    """
    a = _gather(schedule.sqrt_alpha_bar, t, x0.ndim)
    b = _gather(schedule.sqrt_one_minus_alpha_bar, t, x0.ndim)
    return a * x0 + b * noise


def timestep_embedding(t, dim, max_period=10000.0):
    """Sinusoidal diffusion-step embedding (Transformer convention).

    Args:
        t: int or float step indices, shape ``(B,)``.
        dim: embedding width (half sin, half cos; odd dims zero-pad).

    >>> timestep_embedding(jnp.arange(3), 8).shape
    (3, 8)
    """
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype='float32') / half)
    args = t.astype('float32')[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
    if dim % 2:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def ddpm_sample(eps_fn, shape, schedule, key, clip=None):
    """Ancestral DDPM sampling as ONE ``lax.scan`` over all T steps.

    Args:
        eps_fn: callable ``(x_t, t) -> eps_hat`` where ``x_t`` has
            ``shape`` and ``t`` is a scalar int32 (traced); typically a
            closure over the network and its conditioning.
        shape: sample shape including batch.
        schedule: :class:`DiffusionSchedule`.
        key: PRNG key.
        clip: optional ``(lo, hi)`` — clamp the implied ``x_0``
            estimate each step (standard for bounded data like audio).

    Returns:
        ``x_0`` sample of ``shape``.
    """
    key, sub = jax.random.split(key)
    x_t = jax.random.normal(sub, shape)

    def step(carry, t):
        x, key = carry
        key, sub = jax.random.split(key)
        eps = eps_fn(x, t)
        a_t = _gather(schedule.alphas, t, x.ndim)
        ab_t = _gather(schedule.alpha_bar, t, x.ndim)
        b_t = _gather(schedule.betas, t, x.ndim)
        if clip is not None:
            # posterior mean through the clamped x0 estimate
            x0 = (x - jnp.sqrt(1.0 - ab_t) * eps) / jnp.sqrt(ab_t)
            x0 = jnp.clip(x0, clip[0], clip[1])
            ab_prev = jnp.where(
                t > 0, jnp.take(schedule.alpha_bar, jnp.maximum(t - 1, 0)),
                1.0)
            coef0 = jnp.sqrt(ab_prev) * b_t / (1.0 - ab_t)
            coeft = jnp.sqrt(a_t) * (1.0 - ab_prev) / (1.0 - ab_t)
            mean = coef0 * x0 + coeft * x
            var = b_t * (1.0 - ab_prev) / (1.0 - ab_t)
        else:
            mean = (x - b_t / jnp.sqrt(1.0 - ab_t) * eps) / jnp.sqrt(a_t)
            var = b_t
        noise = jax.random.normal(sub, x.shape)
        x = mean + jnp.where(t > 0, jnp.sqrt(var), 0.0) * noise
        return (x, key), None

    steps = jnp.arange(schedule.num_steps - 1, -1, -1)
    (x0, _), _ = jax.lax.scan(step, (x_t, key), steps)
    return x0


def ddim_sample(eps_fn, shape, schedule, key, num_steps=None, eta=0.0,
                clip=None):
    """DDIM sampling (deterministic for ``eta=0``) as ONE ``lax.scan``.

    A strided subsequence of ``num_steps`` timesteps makes synthesis
    ``T / num_steps`` times cheaper than ancestral sampling; with
    ``eta=0`` the reverse process is deterministic given ``x_T``.

    Args:
        eps_fn, shape, schedule, key, clip: as :func:`ddpm_sample`.
        num_steps: evaluation count (default: all ``T`` steps).
        eta: DDIM stochasticity in [0, 1]; 1 matches DDPM's posterior
            variance on the subsequence.
    """
    T = schedule.num_steps
    if num_steps is None:
        num_steps = T
    # evenly strided subsequence, high -> low, always ending at 0
    ts = np.unique(np.linspace(0, T - 1, num_steps).round().astype(
        'int64'))[::-1]
    prev = np.concatenate([ts[1:], [-1]])
    key, sub = jax.random.split(key)
    x_t = jax.random.normal(sub, shape)

    def step(carry, t_pair):
        x, key = carry
        t, t_prev = t_pair
        key, sub = jax.random.split(key)
        eps = eps_fn(x, t)
        ab_t = _gather(schedule.alpha_bar, t, x.ndim)
        ab_prev = jnp.where(
            t_prev >= 0,
            jnp.take(schedule.alpha_bar, jnp.maximum(t_prev, 0)), 1.0)
        x0 = (x - jnp.sqrt(1.0 - ab_t) * eps) / jnp.sqrt(ab_t)
        if clip is not None:
            x0 = jnp.clip(x0, clip[0], clip[1])
        sigma = eta * jnp.sqrt(
            (1.0 - ab_prev) / (1.0 - ab_t)
            * (1.0 - ab_t / ab_prev))
        dir_xt = jnp.sqrt(
            jnp.maximum(1.0 - ab_prev - sigma ** 2, 0.0)) * eps
        noise = jax.random.normal(sub, x.shape)
        x = (jnp.sqrt(ab_prev) * x0 + dir_xt
             + jnp.where(t_prev >= 0, sigma, 0.0) * noise)
        return (x, key), None

    pairs = (jnp.asarray(ts.copy(), dtype='int32'),
             jnp.asarray(prev.copy(), dtype='int32'))
    (x0, _), _ = jax.lax.scan(step, (x_t, key), pairs)
    return x0
