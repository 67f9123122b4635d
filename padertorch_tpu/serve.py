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

For speech models that serve variable-length inputs, mark the time
axis symbolic too (one artifact for any batch size AND length):

>>> blob = export_model(
...     m, {'x': np.zeros((3, 4), 'float32')},
...     dynamic_axes={'x': {0: 'b'}})
>>> load_exported(blob)({'x': np.ones((7, 4), 'float32')}).shape
(7, 2)
"""
import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ['export_model', 'export_fn', 'export_generate',
           'load_exported', 'dump_exported']


def _symbolic_specs(example, polymorphic_batch, dynamic_axes):
    """Build the ShapeDtypeStruct pytree (with symbolic dims)."""
    from jax import export as jax_export

    if dynamic_axes is not None:
        # one shared scope for all names, so equal names mean equal dims
        names = sorted({n for axes in dynamic_axes.values()
                        for n in axes.values()})
        syms = jax_export.symbolic_shape(','.join(names))
        if not isinstance(syms, (tuple, list)):
            syms = (syms,)
        symbols = dict(zip(names, syms))

        def spec(path, x):
            x = jnp.asarray(x)
            shape = list(x.shape)
            key = path[0].key if path and hasattr(path[0], 'key') else None
            for axis, name in dynamic_axes.get(key, {}).items():
                shape[axis] = symbols[name]
            return jax.ShapeDtypeStruct(tuple(shape), x.dtype)

        return jax.tree_util.tree_map_with_path(spec, example)
    if polymorphic_batch:
        (b,) = jax_export.symbolic_shape('b')  # one shared scope

        def poly(x):
            x = jnp.asarray(x)
            if x.ndim == 0:
                return jax.ShapeDtypeStruct((), x.dtype)
            return jax.ShapeDtypeStruct((b,) + x.shape[1:], x.dtype)
        return jax.tree_util.tree_map(poly, example)
    return jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(
            jnp.asarray(x).shape, jnp.asarray(x).dtype), example)


def export_model(model, example, polymorphic_batch=True, *,
                 dynamic_axes=None, platforms=None):
    """Serialize ``model.forward`` to a StableHLO artifact (bytes).

    Args:
        model: a Model/Module (put in ``eval()`` mode first; buffers
            and parameters are baked into the artifact as constants).
        example: example input pytree (numpy/jax arrays); defines
            dtypes and non-symbolic shapes.
        polymorphic_batch: export with a symbolic leading (batch)
            dimension so any batch size can be served.  Models on
            the Pallas RNN backend need concrete shapes (kernel
            block sizes are static) — export those with
            ``polymorphic_batch=False`` or switch to the scan
            backend for a polymorphic serving artifact.
        dynamic_axes: finer-grained alternative to
            ``polymorphic_batch`` (overrides it): a
            ``{input_key: {axis: dim_name}}`` map marking arbitrary
            dimensions symbolic — e.g. for variable-length speech,
            ``{'audio': {0: 'b', 1: 't'}}``.  Equal names denote
            equal sizes across inputs.  For a non-dict (single-array)
            example use key ``None``.
        platforms: optional list of lexical backends the artifact must
            run on, e.g. ``('tpu', 'cpu')`` — one artifact, lowered
            for several platforms (default: the current backend).

    Returns:
        bytes — write to disk next to the checkpoint; load anywhere
        with :func:`load_exported` (no model code needed).
    """
    from padertorch_tpu import random as ptrandom

    def fn(batch):
        with ptrandom.key_context(jax.random.PRNGKey(0)):
            return model(batch)

    return export_fn(fn, example, polymorphic_batch,
                     dynamic_axes=dynamic_axes, platforms=platforms)


def export_fn(fn, example, polymorphic_batch=True, *,
              dynamic_axes=None, platforms=None):
    """Like :func:`export_model` for an arbitrary jittable callable
    taking one input pytree (e.g. a generation closure)."""
    from jax import export as jax_export
    args = _symbolic_specs(example, polymorphic_batch, dynamic_axes)
    kwargs = {}
    if platforms is not None:
        kwargs['platforms'] = tuple(platforms)
    exported = jax_export.export(jax.jit(fn), **kwargs)(args)
    return exported.serialize()


def export_generate(decoder, example_memory, *, embed, logits_head,
                    bos_id, max_len, eos_id=None, memory_seq_len=None,
                    polymorphic_batch=True, dynamic_axes=None,
                    platforms=None, **generate_kwargs):
    """Export a WHOLE greedy generation loop as one StableHLO artifact.

    The artifact maps encoder memory directly to ``(tokens, lengths)``
    — KV-cache init, every decode step, head, argmax and eos
    bookkeeping are all inside (the single ``lax.scan`` of
    ``autoregressive_generate``), so the serving side needs no Python
    model code and no per-step host loop.

    Args:
        decoder, embed, logits_head, bos_id, max_len, eos_id: as in
            :func:`...transformer.autoregressive_generate` (embed and
            logits_head are baked in as constants).
        example_memory: (B, S, d_memory) example encoder output.
        memory_seq_len: optionally a (B,) example — then the artifact
            takes ``{'memory': ..., 'memory_seq_len': ...}``.

    Returns:
        bytes for :func:`load_exported`.
    """
    from padertorch_tpu.contrib.mk.modules.transformer import (
        autoregressive_generate)

    def run(memory, seq_len=None):
        return autoregressive_generate(
            decoder, memory, embed=embed, logits_head=logits_head,
            bos_id=bos_id, max_len=max_len, eos_id=eos_id,
            memory_seq_len=seq_len, **generate_kwargs)

    if memory_seq_len is None:
        example = example_memory

        def fn(memory):
            return run(memory)
    else:
        example = {'memory': example_memory,
                   'memory_seq_len': np.asarray(memory_seq_len)}

        def fn(batch):
            return run(batch['memory'], batch['memory_seq_len'])

    return export_fn(fn, example, polymorphic_batch,
                     dynamic_axes=dynamic_axes, platforms=platforms)


def dump_exported(model, example, path, **kwargs):
    """Write a serving artifact directory: StableHLO blob + meta.json.

    ``path/forward.jaxexport`` is the :func:`export_model` blob;
    ``path/meta.json`` records the model class, input shapes/dtypes and
    export options for the serving side's sanity checks.  Load with
    ``load_exported(path)``.
    """
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    blob = export_model(model, example, **kwargs)
    (path / 'forward.jaxexport').write_bytes(blob)
    leaves = jax.tree_util.tree_leaves(example)
    meta = {
        'format': 'padertorch_tpu.serve.v1',
        'model': type(model).__module__ + '.' + type(model).__name__,
        'input_shapes': [list(np.shape(l)) for l in leaves],
        'input_dtypes': [np.asarray(l).dtype.name for l in leaves],
        'options': {
            k: (list(v) if isinstance(v, tuple) else v)
            for k, v in kwargs.items()
            if isinstance(v, (str, int, float, bool, tuple, list,
                              dict, type(None)))
        },
    }
    (path / 'meta.json').write_text(json.dumps(meta, indent=2, default=str))
    return path


def load_exported(blob):
    """Blob (bytes) or artifact path/dir -> callable(batch)."""
    from jax import export as jax_export
    if isinstance(blob, (str, Path)):
        blob = Path(blob)
        if blob.is_dir():
            blob = blob / 'forward.jaxexport'
        blob = blob.read_bytes()
    exported = jax_export.deserialize(
        blob if isinstance(blob, bytearray) else bytearray(blob))
    return lambda batch: exported.call(batch)
