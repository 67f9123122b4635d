"""Gaussian KL divergences.

Reference parity: ``padertorch/ops/losses/kl_divergence.py:17`` — but
without a distributions-object dependency: distributions are given as
(loc, scale) arrays for the diagonal posterior and either (loc, scale)
(diagonal) or (loc, scale_tril) (full covariance) for the prior.
"""
import jax.numpy as jnp
import numpy as np

__all__ = ['gaussian_kl_divergence']


def gaussian_kl_divergence(q, p):
    """KL(q || p) between all posteriors and all prior components.

    Args:
        q: tuple (loc, scale) of the diagonal Normal posterior,
            shapes (B1, ..., BN, D).
        p: tuple (loc, scale) for a diagonal Normal prior or
            (loc, scale_tril) with ``scale_tril.ndim == loc.ndim + 1`` for
            a full-covariance (Multivariate) Normal prior,
            shapes (K1, ..., KN, D[, D]).

    Returns:
        KL of shape (B1, ..., BN, K1, ..., KN).

    >>> import jax.numpy as jnp
    >>> q = (jnp.zeros((3, 2)), jnp.ones((3, 2)))
    >>> p = (jnp.zeros((4, 2)), jnp.ones((4, 2)))
    >>> gaussian_kl_divergence(q, p).shape
    (3, 4)
    >>> float(gaussian_kl_divergence(q, p)[0, 0])
    0.0
    """
    q_loc, q_scale = q
    p_loc, p_scale = p
    batch_shape = q_loc.shape[:-1]
    d = q_loc.shape[-1]
    component_shape = p_loc.shape[:-1]
    assert p_loc.shape[-1] == d, (p_loc.shape[-1], d)

    q_loc = q_loc.reshape(-1, d)
    q_scale = q_scale.reshape(-1, d)
    p_loc_flat = p_loc.reshape(-1, d)

    if p_scale.ndim == p_loc.ndim + 1:
        # Full-covariance prior given as scale_tril (K, D, D).
        p_tril = p_scale.reshape(-1, d, d)
        # log|Sigma_p|^0.5 = sum log diag(L)
        term1 = (
            jnp.log(jnp.diagonal(p_tril, axis1=-2, axis2=-1)).sum(-1)[:, None]
            - jnp.log(q_scale).sum(-1)[None, :]
        )
        l_inv = jnp.linalg.inv(p_tril)
        # tr(Sigma_p^-1 Sigma_q) with Sigma_q diagonal:
        term2 = jnp.einsum('kij,bj->kb', l_inv ** 2, q_scale ** 2)
        diff = p_loc_flat[:, None, :] - q_loc[None, :, :]  # (K, B, D)
        # ||L^-1 (mu_p - mu_q)||^2
        term3 = jnp.sum(
            jnp.einsum('kij,kbj->kbi', l_inv, diff) ** 2, -1)
        kl = (term1 + 0.5 * (term2 + term3 - d)).T  # (B, K)
    elif p_scale.ndim == p_loc.ndim:
        p_scale_flat = p_scale.reshape(-1, d)
        ql = q_loc[:, None, :]
        qs = q_scale[:, None, :]
        var_ratio = (qs / p_scale_flat) ** 2
        t1 = ((ql - p_loc_flat) / p_scale_flat) ** 2
        kl = 0.5 * (var_ratio + t1 - 1 - jnp.log(var_ratio)).sum(-1)
    else:
        raise ValueError((p_loc.shape, p_scale.shape))
    return kl.reshape(*batch_shape, *component_shape)
