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
           'load_exported', 'dump_exported', 'ContinuousBatcher']


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


class ContinuousBatcher:
    """Continuous (in-flight) batching over a KV-cache decoder.

    The production serving pattern: a fixed pool of ``num_slots`` cache
    rows, each slot decoding ONE request at its own position.  Requests
    are admitted into free slots as they arrive and leave the moment
    they emit EOS — no waiting for the whole batch to finish, no
    per-request recompile.  Every step is one jitted
    ``TransformerDecoder.decode_step`` call with a per-row position
    vector (the RoPE/causal-mask/cache-write machinery all accept (B,)
    positions), so the program is compiled ONCE for the slot pool and
    reused for the lifetime of the server.

    Slot reuse needs no cache zeroing: a new request restarts at
    position 0 and overwrites the stale K/V rows it reaches; stale
    entries past its current position stay hidden by the causal mask.

    Batched greedy output is exactly equal to decoding each request
    alone (tested against ``autoregressive_generate``).

    Args:
        decoder: a :class:`TransformerDecoder` (or same protocol).
        embed: (B,) int32 ids -> (B, d_model).
        logits_head: (B, d_model) -> (B, vocab).
        num_slots: concurrent requests (the compiled batch size).
        max_len: per-request position budget (self-cache length).
        max_memory_len: encoder-memory budget (cross-cache length).
        d_memory: encoder feature size.
        bos_id, eos_id: start / stop token ids.
        max_new_tokens: per-request output cap (default ``max_len``).
        dtype: cache/memory dtype.
    """

    def __init__(self, decoder, *, embed, logits_head, num_slots,
                 max_len, max_memory_len, d_memory, bos_id, eos_id,
                 max_new_tokens=None, dtype=jnp.float32):
        import collections
        self.num_slots = num_slots
        self.max_len = max_len
        self.max_memory_len = max_memory_len
        self.bos_id = bos_id
        self.eos_id = eos_id
        self.max_new_tokens = max_new_tokens or max_len
        zero_mem = jnp.zeros((num_slots, max_memory_len, d_memory), dtype)
        self.cache = decoder.init_cache(zero_mem, max_len, dtype=dtype)
        self.tokens = np.full((num_slots,), bos_id, 'int32')
        self.positions = np.zeros((num_slots,), 'int32')
        self.mem_lens = np.zeros((num_slots,), 'int32')
        self.active = np.zeros((num_slots,), bool)
        self._prompt = [[] for _ in range(num_slots)]
        self._output = [[] for _ in range(num_slots)]
        self._request = [None] * num_slots
        self.pending = collections.deque()
        self.finished = {}
        self._next_id = 0

        @jax.jit
        def _step(cache, tokens, positions, mem_lens):
            x = embed(tokens)[:, None, :]
            out, cache = decoder.decode_step(
                x, cache, positions, memory_seq_len=mem_lens)
            return logits_head(out[:, 0]), cache

        @jax.jit
        def _admit(cache, memory_row, slot):
            new_cross = []
            for layer, ck in zip(decoder.layers, cache['cross']):
                kv = layer.cross_attn.precompute_kv(memory_row)
                new_cross.append({
                    'k': jax.lax.dynamic_update_slice_in_dim(
                        ck['k'], kv['k'].astype(ck['k'].dtype),
                        slot, axis=0),
                    'v': jax.lax.dynamic_update_slice_in_dim(
                        ck['v'], kv['v'].astype(ck['v'].dtype),
                        slot, axis=0),
                })
            return {'self': cache['self'], 'cross': new_cross}

        self._step_fn = _step
        self._admit_fn = _admit

    def submit(self, memory, memory_len=None, prompt=()):
        """Queue a request.  ``memory``: (S, d_memory) encoder output
        (S <= ``max_memory_len``); ``prompt``: token ids forced after
        BOS before free-running generation.  Returns a request id."""
        memory = np.asarray(memory)
        assert memory.ndim == 2, memory.shape
        s = memory.shape[0]
        assert s <= self.max_memory_len, (s, self.max_memory_len)
        request_id = self._next_id
        self._next_id += 1
        self.pending.append(
            (request_id, memory, int(memory_len or s), list(prompt)))
        return request_id

    @property
    def num_active(self):
        return int(self.active.sum())

    def _try_admit(self):
        while self.pending and not self.active.all():
            slot = int(np.argmin(self.active))  # first free slot
            request_id, memory, mem_len, prompt = self.pending.popleft()
            padded = np.zeros(
                (1, self.max_memory_len, memory.shape[-1]),
                memory.dtype)
            padded[0, :memory.shape[0]] = memory
            self.cache = self._admit_fn(
                self.cache, jnp.asarray(padded), slot)
            self.tokens[slot] = self.bos_id
            self.positions[slot] = 0
            self.mem_lens[slot] = mem_len
            self.active[slot] = True
            self._prompt[slot] = prompt
            self._output[slot] = []
            self._request[slot] = request_id

    def _finish(self, slot):
        self.finished[self._request[slot]] = list(self._output[slot])
        self.active[slot] = False
        self._request[slot] = None

    def step(self):
        """Admit pending requests, then run ONE decode step for every
        active slot.  Returns the number of active slots stepped."""
        self._try_admit()
        if not self.active.any():
            return 0
        logits, self.cache = self._step_fn(
            self.cache, jnp.asarray(self.tokens),
            jnp.asarray(self.positions), jnp.asarray(self.mem_lens))
        greedy = np.asarray(jnp.argmax(logits, axis=-1)).astype('int32')
        stepped = 0
        for slot in range(self.num_slots):
            if not self.active[slot]:
                continue
            stepped += 1
            self.positions[slot] += 1
            if self._prompt[slot]:
                # teacher-forced prompt feed (chunkless prefill)
                self.tokens[slot] = self._prompt[slot].pop(0)
                continue
            token = int(greedy[slot])
            self._output[slot].append(token)
            self.tokens[slot] = token
            if (token == self.eos_id
                    or len(self._output[slot]) >= self.max_new_tokens
                    or self.positions[slot] >= self.max_len):
                self._finish(slot)
        return stepped

    def run_until_done(self, max_steps=100000):
        """Drive :meth:`step` until every request finished; returns
        ``{request_id: token list (eos included if emitted)}``."""
        for _ in range(max_steps):
            if not self.pending and not self.active.any():
                break
            self.step()
        else:
            raise RuntimeError('run_until_done: step budget exhausted')
        return dict(self.finished)
