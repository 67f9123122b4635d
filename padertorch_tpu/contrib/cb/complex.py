"""Complex-array helpers. Reference parity: ``padertorch/contrib/cb/complex.py``."""
import jax.numpy as jnp

__all__ = ['ComplexTensor_to_Complex', 'is_complex', 'is_torch',
           'to_complex', 'from_real_imag', 'to_real_imag']


def is_complex(x):
    return jnp.iscomplexobj(x)


def is_torch(x):
    """True if ``x`` is a torch tensor (reference cb/complex.py) —
    useful in migration code that handles both torch checkpoints and
    jax arrays.  Import-guarded so torch stays optional."""
    try:
        import torch
    except ImportError:
        return False
    return isinstance(x, torch.Tensor)


def to_complex(x, axis=-1):
    """Stacked (..., 2) real/imag -> complex.

    >>> import jax.numpy as jnp
    >>> to_complex(jnp.asarray([[1., 2.]]))
    Array([1.+2.j], dtype=complex64)
    """
    real = jnp.take(x, 0, axis=axis)
    imag = jnp.take(x, 1, axis=axis)
    return jnp.asarray(real + 1j * imag)


def to_real_imag(x, axis=-1):
    return jnp.stack([jnp.real(x), jnp.imag(x)], axis=axis)


from_real_imag = to_complex
ComplexTensor_to_Complex = to_complex  # legacy name
