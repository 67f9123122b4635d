"""Model export for serving (StableHLO via ``jax.export``).

Production deployment story: a trained Model's forward pass is
serialized as a self-contained StableHLO artifact — loadable in any
process (or another serving runtime that speaks StableHLO) without the
Python model code, with shape polymorphism for the batch axis.

>>> import numpy as np
>>> import padertorch_tpu as pt
>>> from padertorch_tpu import nn
>>> from padertorch_tpu import random as ptrandom
>>> class M(pt.Model):
...     def __init__(self):
...         self.lin = nn.Linear(4, 2)
...     def forward(self, batch):
...         return self.lin(batch['x'])
...     def review(self, batch, outputs):
...         return {'loss': outputs.sum()}
>>> ptrandom.seed(0)
>>> m = M().eval()
>>> blob = export_model(m, {'x': np.zeros((3, 4), 'float32')})
>>> fn = load_exported(blob)
>>> out = fn({'x': np.ones((5, 4), 'float32')})  # batch-polymorphic
>>> out.shape
(5, 2)
"""
import jax
import jax.numpy as jnp
import numpy as np

__all__ = ['export_model', 'load_exported']


def export_model(model, example, polymorphic_batch=True):
    """Serialize ``model.forward`` to a StableHLO artifact (bytes).

    Args:
        model: a Model/Module (put in ``eval()`` mode first; buffers
            and parameters are baked into the artifact as constants).
        example: example input pytree (numpy/jax arrays); defines
            dtypes and non-batch shapes.
        polymorphic_batch: export with a symbolic leading (batch)
            dimension so any batch size can be served.  Models on
            the Pallas RNN backend need concrete shapes (kernel
            block sizes are static) — export those with
            ``polymorphic_batch=False`` or switch to the scan
            backend for a polymorphic serving artifact.

    Returns:
        bytes — write to disk next to the checkpoint; load anywhere
        with :func:`load_exported` (no model code needed).
    """
    from jax import export as jax_export
    from padertorch_tpu import random as ptrandom

    def fn(batch):
        with ptrandom.key_context(jax.random.PRNGKey(0)):
            return model(batch)

    if polymorphic_batch:
        (b,) = jax_export.symbolic_shape('b')  # one shared scope

        def poly(x):
            x = jnp.asarray(x)
            if x.ndim == 0:
                return jax.ShapeDtypeStruct((), x.dtype)
            return jax.ShapeDtypeStruct((b,) + x.shape[1:], x.dtype)
        args = jax.tree_util.tree_map(poly, example)
    else:
        args = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(
                jnp.asarray(x).shape, jnp.asarray(x).dtype), example)
    exported = jax_export.export(jax.jit(fn))(args)
    return exported.serialize()


def load_exported(blob):
    """bytes -> callable(batch) running the exported computation."""
    from jax import export as jax_export
    exported = jax_export.deserialize(
        blob if isinstance(blob, bytearray) else bytearray(blob))
    return lambda batch: exported.call(batch)
