"""Regression losses for (speech) signal reconstruction.

Reference parity: ``padertorch/ops/losses/regression.py`` — identical
semantics: the time axis (last) is always mean/sum-reduced as defined per
loss; ``reduction`` ('mean'/'sum'/None) applies to the remaining
speaker/batch axes.  All functions are jit-safe and differentiable.

>>> import jax.numpy as jnp
>>> estimate = jnp.array([[1., 2, 3], [4, 5, 6]])
>>> target = jnp.array([[2., 3, 4], [4, 0, 6]])
>>> float(mse_loss(estimate, target))  # doctest: +ELLIPSIS
9.333...
>>> [round(float(x), 4) for x in sdr_loss(estimate, target, reduction=None)]
[-9.8528, -3.1806]
>>> round(float(si_sdr_loss(estimate, target)), 4)
-10.7099
>>> round(float(log_mse_loss(estimate, target)), 4)
0.9208
>>> round(float(log1p_mse_loss(estimate, target)), 4)
1.2711
>>> round(float(source_aggregated_sdr_loss(estimate, target)), 4)
-4.6133
"""
import jax
import jax.numpy as jnp

__all__ = [
    'mse_loss',
    'log_mse_loss',
    'sdr_loss',
    'si_sdr_loss',
    'log1p_mse_loss',
    'source_aggregated_sdr_loss',
]


def _sqnorm(x, axis=None, keepdims=False):
    x = jnp.abs(x)
    return jnp.sum(x * x, axis=axis, keepdims=keepdims)


def _mse(estimate, target, axis=None):
    error = jnp.abs(estimate - target)
    return jnp.mean(error * error, axis=axis)


def _get_scaling_factor(target, estimate):
    return (
        jnp.sum(estimate * target, axis=-1, keepdims=True)
        / _sqnorm(target, axis=-1, keepdims=True)
    )


def _reduce(array, reduction):
    if reduction is None or reduction == 'none':
        return array
    if reduction == 'sum':
        return jnp.sum(array)
    if reduction == 'mean':
        return jnp.mean(array)
    raise ValueError(
        f'Unknown reduction: {reduction}. Choose from "sum", "mean".')


def _get_threshold(soft_sdr_max):
    """tau for the thresholded (soft-max'ed) SDR (Wisdom 2020)."""
    if soft_sdr_max is None:
        return None
    assert 1 < soft_sdr_max < 50, (
        f'Uncommon value for soft_sdr_max: {soft_sdr_max}')
    return 10 ** (-soft_sdr_max / 10)


def mse_loss(estimate, target, reduction='sum'):
    """MSE; time axis mean-reduced, ``reduction`` over the rest."""
    return _reduce(_mse(estimate, target, axis=-1), reduction=reduction)


def log_mse_loss(estimate, target, reduction='sum', soft_sdr_max=None):
    """log10-MSE (Heitkaemper 2019 eq. 11), optional soft SDR limit."""
    loss = _mse(estimate, target, axis=-1)
    if soft_sdr_max:
        loss = loss + _get_threshold(soft_sdr_max) * jnp.mean(
            target * target, axis=-1)
    return _reduce(jnp.log10(loss), reduction=reduction)


def sdr_loss(estimate, target, reduction='mean', soft_sdr_max=None):
    """Negative (scale-dependent) SDR/SNR, optional soft limit."""
    target_norm = _sqnorm(target, axis=-1)
    denominator = _sqnorm(estimate - target, axis=-1)
    if soft_sdr_max is not None:
        denominator = denominator + _get_threshold(soft_sdr_max) * target_norm
    sdr = 10 * jnp.log10(target_norm / denominator)
    return -_reduce(sdr, reduction=reduction)


def si_sdr_loss(estimate, target, reduction='mean', offset_invariant=False,
                grad_stop=False, soft_sdr_max=None):
    """Negative scale-invariant SDR (TasNet paper, section 2.2.4).

    Args:
        estimate (... x T), target (... x T)
        reduction: 'mean', 'sum' or None over non-time axes.
        offset_invariant: mean-normalize first (shift+scale invariant).
        grad_stop: don't differentiate through the scaling factor.
        soft_sdr_max: soft SDR ceiling (Wisdom 2020).
    """
    assert estimate.shape == target.shape, (estimate.shape, target.shape)
    assert estimate.ndim >= 1, estimate.shape
    assert estimate.ndim == 1 or estimate.shape[-2] < 10, (
        f'Number of speakers should be small (<10, not {estimate.shape[-2]})!'
    )
    if offset_invariant:
        estimate = estimate - jnp.mean(estimate, axis=-1, keepdims=True)
        target = target - jnp.mean(target, axis=-1, keepdims=True)
    scaling_factor = _get_scaling_factor(target, estimate)
    if grad_stop:
        scaling_factor = jax.lax.stop_gradient(scaling_factor)
    s_target = scaling_factor * target
    return sdr_loss(
        estimate, s_target, reduction=reduction, soft_sdr_max=soft_sdr_max)


def log1p_mse_loss(estimate, target, reduction='sum'):
    """log10(1 + MSE) (von Neumann 2020 eq. 4)."""
    return _reduce(
        jnp.log10(1 + _mse(estimate, target, axis=-1)), reduction=reduction)


def source_aggregated_sdr_loss(estimate, target, soft_sdr_max=None):
    """Source-aggregated SDR: powers summed over all axes before the ratio."""
    target_norm = _sqnorm(target)
    denominator = _sqnorm(estimate - target)
    if soft_sdr_max is not None:
        denominator = denominator + _get_threshold(soft_sdr_max) * target_norm
    sa_sdr = 10 * jnp.log10(target_norm / denominator)
    return -sa_sdr
