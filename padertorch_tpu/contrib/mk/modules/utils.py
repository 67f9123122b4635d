"""Weight utilities.

Reference parity: ``padertorch/contrib/mk/modules/utils.py``
(``normalize`` — forced weight normalization, Karras et al., Analyzing
and Improving the Training Dynamics of Diffusion Models, 2024, Alg. 1).
"""
import typing as tp

import numpy as np
import jax.numpy as jnp

__all__ = ['normalize']


def normalize(w, eps: float = 1e-4,
              chunks: tp.Optional[int] = None):
    """Normalize ``w`` rows to unit scale: ``w / (eps + alpha * |w|)``
    with ``alpha = sqrt(n_norms / n_elements)``.

    >>> w = jnp.ones((4, 16))
    >>> out = normalize(w)
    >>> bool(jnp.allclose(jnp.linalg.norm(out, axis=-1), 4.0,
    ...                   atol=1e-3))
    True
    """
    if chunks is None:
        norm = jnp.linalg.norm(w, axis=-1, keepdims=True)
        alpha = np.sqrt(norm.size / w.size)
        return w / (eps + alpha * norm)
    w_ = jnp.split(w, chunks, axis=-1)
    w = jnp.stack(w_, axis=-1)
    norm = jnp.linalg.norm(w, axis=-2, keepdims=True)
    alpha = np.sqrt(norm.size / w.size)
    w = w / (eps + alpha * norm)
    w_ = jnp.split(w, chunks, axis=-1)
    return jnp.concatenate(w_, axis=-2).squeeze(-1)
