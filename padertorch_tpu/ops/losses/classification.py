"""Classification losses. Reference parity: ``padertorch/ops/losses/classification.py``."""
import jax
import jax.numpy as jnp

__all__ = ['softmax_cross_entropy', 'IGNORE_INDEX']

IGNORE_INDEX = -1


def softmax_cross_entropy(x, t):
    """Cross entropy over logits; labels equal to -1 are ignored.

    All axes but the last of ``x`` are independent: ``x: (..., K)``,
    ``t: (...)``.  The mean is taken over non-ignored elements (torch
    ``CrossEntropyLoss(ignore_index=-1)`` semantics).

    >>> import jax.numpy as jnp
    >>> x = jnp.array([[10., 0.], [0., 10.]])
    >>> t = jnp.array([0, 1])
    >>> float(softmax_cross_entropy(x, t)) < 1e-3
    True
    >>> t = jnp.array([0, -1])  # second element ignored
    >>> float(softmax_cross_entropy(x, t)) < 1e-3
    True
    """
    assert x.shape[:-1] == t.shape, (x.shape, t.shape)
    logp = jax.nn.log_softmax(x, axis=-1)
    ignore = t == IGNORE_INDEX
    safe_t = jnp.where(ignore, 0, t)
    picked = jnp.take_along_axis(
        logp, jnp.expand_dims(safe_t, -1), axis=-1)[..., 0]
    picked = jnp.where(ignore, 0.0, picked)
    count = jnp.maximum(jnp.sum(~ignore), 1)
    return -jnp.sum(picked) / count
