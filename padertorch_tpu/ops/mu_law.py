"""mu-law companding. Reference parity: ``padertorch/ops/mu_law.py``."""
import jax.numpy as jnp
import numpy as np

__all__ = ['mu_law_encode', 'mu_law_decode']


def mu_law_encode(x, mu_quantization=256):
    """Encode a [-1, 1] signal to mu-law quantization indices.

    >>> import jax.numpy as jnp
    >>> mu_law_encode(jnp.array([-1.0, 0.0, 1.0])).tolist()
    [0, 128, 255]
    """
    mu = mu_quantization - 1.0
    scaling = np.log1p(mu)
    x_mu = jnp.sign(x) * jnp.log1p(mu * jnp.abs(x)) / scaling
    encoding = ((x_mu + 1) / 2 * mu + 0.5).astype(jnp.int32)
    return encoding


def mu_law_decode(x, mu_quantization=256):
    """Decode mu-law indices back to a [-1, 1] signal.

    >>> import jax.numpy as jnp
    >>> decoded = mu_law_decode(mu_law_encode(jnp.array([-0.5, 0.0, 0.5])))
    >>> [round(float(v), 2) for v in decoded]
    [-0.5, 0.0, 0.5]
    """
    x = x.astype(jnp.float32)
    mu = mu_quantization - 1.0
    signal = 2 * (x / mu) - 1
    magnitude = (1 / mu) * ((1 + mu) ** jnp.abs(signal) - 1)
    return jnp.sign(signal) * magnitude
