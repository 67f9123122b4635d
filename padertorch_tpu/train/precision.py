"""Mixed-precision training policy (TPU bfloat16).

TPU-native feature beyond the reference (padertorch has no AMP
equivalent; torch GPU AMP needs loss scaling — bf16 does not, since it
keeps float32's exponent range): the trainer holds float32 *master*
parameters and optimizer moments, while the forward/backward pass runs
in ``compute_dtype`` (default bfloat16, the MXU's native input type).

Semantics inside the jitted step:

- parameters, buffers and floating example leaves are cast to
  ``compute_dtype`` before ``forward``;
- the loss is cast to float32 before ``jax.value_and_grad`` seeds the
  backward pass;
- the cast is the first traced op on each parameter, so its VJP casts
  the cotangent back: **gradients arrive in float32** and the optimizer
  update runs entirely in float32 (master-weight semantics);
- buffers updated during forward (running statistics) are cast back to
  their master dtypes before they are stored, so state never degrades
  across steps.

Usage::

    Trainer(model, storage_dir, optimizer, precision='bfloat16')

or, for fine-grained control::

    Trainer(..., precision=Precision('bfloat16', cast_examples=False))

Every recipe accepts it as a sacred-style override
(``python -m ...pit.train ... with precision=bfloat16``).

Known limitation (CPU only): combining the policy with the Pallas
``interpret`` RNN backend can compile a dot that XLA:CPU's thunk
runtime refuses to execute (``DotThunk: BF16 x BF16 = F32``) — an
upstream CPU-runtime gap, not a numerics issue.  Use the ``scan`` RNN
backend for CPU runs under the policy; on TPU (the production target)
the Pallas backend + policy is the benchmarked configuration.
"""
import jax
import jax.numpy as jnp
import numpy as np

__all__ = ['Precision']


def _is_float(leaf):
    dtype = getattr(leaf, 'dtype', None)
    if dtype is None:
        return isinstance(leaf, float)
    return jnp.issubdtype(dtype, jnp.floating)


class Precision:
    """Cast policy for mixed-precision train/val steps.

    Args:
        compute_dtype: dtype of forward/backward compute ('bfloat16').
        cast_examples: also cast floating example leaves (inputs). Turn
            off when the model's frontend needs float32 inputs (e.g. a
            float32 STFT) and casts down itself.
        cast_buffers: also cast buffers (running statistics) for the
            forward pass. Master buffers stay in their own dtype either
            way.

    >>> p = Precision()
    >>> tree = {'w': jnp.ones((2,), jnp.float32), 'i': jnp.arange(2)}
    >>> cast = p.cast_floating(tree)
    >>> cast['w'].dtype.name, cast['i'].dtype.name
    ('bfloat16', 'int32')
    >>> restored = p.restore_dtypes(cast, tree)
    >>> restored['w'].dtype.name, restored['i'].dtype.name
    ('float32', 'int32')
    """

    def __init__(self, compute_dtype='bfloat16', cast_examples=True,
                 cast_buffers=True):
        self.compute_dtype = jnp.dtype(compute_dtype)
        self.cast_examples = cast_examples
        self.cast_buffers = cast_buffers

    def cast_floating(self, tree):
        """Cast floating (real) leaves to ``compute_dtype``.

        Integer, bool and complex leaves pass through unchanged.
        """
        def cast(leaf):
            if _is_float(leaf):
                return jnp.asarray(leaf, self.compute_dtype)
            return leaf
        return jax.tree_util.tree_map(cast, tree)

    def restore_dtypes(self, tree, like):
        """Cast ``tree``'s leaves back to the dtypes of ``like``."""
        def restore(leaf, ref):
            ref_dtype = getattr(ref, 'dtype', None)
            if ref_dtype is None:
                return leaf
            cur_dtype = getattr(leaf, 'dtype', None)
            if cur_dtype == ref_dtype:
                return leaf
            return jnp.asarray(leaf, ref_dtype)
        return jax.tree_util.tree_map(restore, tree, like)

    def __repr__(self):
        return (f'{type(self).__name__}('
                f'compute_dtype={np.dtype(self.compute_dtype).name!r}, '
                f'cast_examples={self.cast_examples}, '
                f'cast_buffers={self.cast_buffers})')
