"""Elementwise functions over sequence containers.

Reference parity: ``padertorch/ops/sequence/pointwise.py`` — there these
lift elementwise torch functions over PackedSequence. In the TPU-native
design sequences are padded arrays, so the functions apply directly; they
are exported here so reference code keeps importing from the same place.
Note: for ops that don't map 0 -> 0 (e.g. exp), apply ``compute_mask``
afterwards if padded positions must stay zero.
"""
import jax.numpy as jnp
import jax

__all__ = [
    'sequence_elementwise',
    'abs', 'ceil', 'clamp', 'exp', 'floor', 'log', 'log1p', 'log2',
    'neg', 'relu', 'round', 'sigmoid', 'sign', 'sin', 'cos', 'sqrt',
    'tanh',
]


def sequence_elementwise(function, x, *args, **kwargs):
    """Apply an elementwise function to a sequence container.

    Reference parity: ``ops/sequence/pointwise.py:20`` — there it
    unwraps PackedSequence; here sequences are padded arrays, so this
    applies the function directly (kept so reference code that builds
    its own lifted ops keeps working).
    """
    return function(x, *args, **kwargs)

abs = jnp.abs
ceil = jnp.ceil
exp = jnp.exp
floor = jnp.floor
log = jnp.log
log1p = jnp.log1p
log2 = jnp.log2
neg = jnp.negative
relu = jax.nn.relu
round = jnp.round
sigmoid = jax.nn.sigmoid
sign = jnp.sign
sin = jnp.sin
cos = jnp.cos
sqrt = jnp.sqrt
tanh = jnp.tanh


def clamp(x, min=None, max=None):
    return jnp.clip(x, min, max)
