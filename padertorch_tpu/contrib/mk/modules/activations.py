"""Activation variants.

Reference parity: ``padertorch/contrib/mk/modules/activations.py``.
"""
import jax
import jax.numpy as jnp

from padertorch_tpu.module import Module

__all__ = ['GELU']


class GELU(Module):
    """GELU with optional magnitude preservation: the output is divided
    by the reference's fixed gain constant 0.653 (Karras et al. 2024).

    >>> g = GELU(magnitude_preserving=True)
    >>> x = jnp.asarray([1.0])
    >>> bool(jnp.allclose(g(x), jax.nn.gelu(x, approximate=False)
    ...                   / 0.653))
    True
    """

    scale: float = 0.653

    def __init__(self, approximate: str = 'none',
                 magnitude_preserving: bool = False):
        self.approximate = approximate
        self.magnitude_preserving = magnitude_preserving

    def forward(self, x):
        y = jax.nn.gelu(x, approximate=self.approximate == 'tanh')
        if self.magnitude_preserving:
            return y / self.scale
        return y
