"""Small tensor utilities. Reference parity: ``padertorch/ops/tensor.py``."""
import jax.numpy as jnp

__all__ = [
    'move_axis',
    'broadcast_to',
    'matrix_diag',
    'matrix_eye_like',
    'batch_tril',
]


def move_axis(a, source: int, destination: int):
    """Move one axis of ``a`` from ``source`` to ``destination``.

    >>> import jax.numpy as jnp
    >>> move_axis(jnp.zeros((3, 4, 5)), 0, -1).shape
    (4, 5, 3)
    >>> move_axis(jnp.zeros((3, 4, 5)), -1, 0).shape
    (5, 3, 4)
    """
    return jnp.moveaxis(a, source % a.ndim, destination % a.ndim)


def broadcast_to(tensor, shape):
    """>>> import jax.numpy as jnp
    >>> broadcast_to(jnp.ones((4, 1)), (4, 3)).shape
    (4, 3)
    """
    return jnp.broadcast_to(tensor, shape)


def matrix_diag(x):
    """Diagonal matrices from the last axis.

    >>> import jax.numpy as jnp
    >>> matrix_diag(jnp.ones(2)).tolist()
    [[1.0, 0.0], [0.0, 1.0]]
    >>> matrix_diag(jnp.ones((3, 4))).shape
    (3, 4, 4)
    """
    return x[..., None] * jnp.eye(x.shape[-1], dtype=x.dtype)


def matrix_eye_like(x):
    """Eye matrix broadcast to ``(*x.shape, x.shape[-1])``.

    >>> import jax.numpy as jnp
    >>> matrix_eye_like(jnp.ones((3, 2))).shape
    (3, 2, 2)
    """
    eye = jnp.eye(x.shape[-1], dtype=x.dtype)
    return jnp.broadcast_to(eye, (*x.shape, x.shape[-1]))


def batch_tril(x):
    """Lower-triangular part along the last two axes.

    >>> import jax.numpy as jnp
    >>> batch_tril(jnp.ones((2, 3, 3))).shape
    (2, 3, 3)
    """
    return jnp.tril(x)
