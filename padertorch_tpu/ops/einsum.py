"""Einsum with capital-letter support. Reference parity: ``padertorch/ops/einsum.py:10``."""
import jax.numpy as jnp

__all__ = ['einsum']


def einsum(operation, *operands):
    """``jnp.einsum`` accepting capital letters in the subscripts.

    (torch's einsum historically only accepted [a-z]; the reference
    transliterates capitals. jax accepts both; kept for API parity.)

    >>> import jax.numpy as jnp
    >>> einsum('nE,nK->EK', jnp.ones((3, 2)), jnp.ones((3, 4))).shape
    (2, 4)
    """
    return jnp.einsum(operation, *operands)
