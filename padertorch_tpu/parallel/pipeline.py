"""Pipeline parallelism (GPipe-style) over a ``pipe`` mesh axis.

No reference counterpart — the reference scales by data parallelism
and MPI fan-out only (SURVEY.md section 2.4); this is the TPU-native
extension for models whose layer stack exceeds one chip's HBM: shard a
stack of identical blocks over the ``pipe`` axis of a
:class:`jax.sharding.Mesh`, stream microbatches through the stages,
and hand activations to the next stage with ``lax.ppermute`` over ICI.

Design (idiomatic JAX, compiler-friendly):

- The stage loop is ONE ``lax.scan`` over ``num_micro + S - 1`` ticks
  (the GPipe schedule): every tick each stage applies its block to its
  current activation and ppermutes the result one hop down the ring.
  No data-dependent python control flow — the bubble is expressed with
  masks, so the whole schedule jits into a single XLA program.
- Autodiff "just works": ``ppermute``/``psum`` have transpose rules,
  so ``jax.grad`` through the scan yields the standard 1F1B-equivalent
  backward ppermutes in reverse — no hand-written backward schedule.
- Numerics: pipeline outputs/losses/grads are **bit-equal** to running
  the same stacked blocks sequentially on one device (tested).
"""
import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

__all__ = ['pipeline_apply', 'pipeline_value_and_grad',
           'PipelinedBlocks']


def _ring(num_stages):
    return [(i, (i + 1) % num_stages) for i in range(num_stages)]


def _pipeline_forward(block_fn, local_params, xs, *, axis, num_stages):
    """Per-shard GPipe forward: xs (M, mb, ...) microbatches ->
    outputs (M, mb, ...) of the full S-stage chain, replicated."""
    s = jax.lax.axis_index(axis)
    m_total = xs.shape[0]
    ticks = m_total + num_stages - 1

    def tick(carry, t):
        state, outputs = carry
        # stage 0 ingests microbatch t (zeros during the drain phase)
        inp = jax.lax.dynamic_index_in_dim(
            xs, jnp.clip(t, 0, m_total - 1), axis=0, keepdims=False)
        inp = jnp.where(t < m_total, inp, jnp.zeros_like(inp))
        x_in = jnp.where(s == 0, inp, state)
        y = block_fn(local_params, x_in)
        # the last stage emits microbatch m = t - (S - 1)
        m = t - (num_stages - 1)
        upd = jax.lax.dynamic_update_index_in_dim(
            outputs, y, jnp.clip(m, 0, m_total - 1), axis=0)
        outputs = jnp.where(
            (s == num_stages - 1) & (m >= 0), upd, outputs)
        state = jax.lax.ppermute(y, axis, _ring(num_stages))
        return (state, outputs), None

    init = (jnp.zeros_like(xs[0]), jnp.zeros_like(xs))
    (_, outputs), _ = jax.lax.scan(
        tick, init, jnp.arange(ticks))
    # replicate the last stage's outputs to every stage (out_specs P())
    outputs = jnp.where(s == num_stages - 1, outputs,
                        jnp.zeros_like(outputs))
    return jax.lax.psum(outputs, axis)


def _split_micro(x, num_micro):
    b = x.shape[0]
    assert b % num_micro == 0, (b, num_micro)
    return x.reshape(num_micro, b // num_micro, *x.shape[1:])


def pipeline_apply(block_fn, stacked_params, x, *, mesh: Mesh,
                   axis: str = 'pipe', num_microbatches: int = None):
    """Apply S chained identical blocks, pipelined over ``axis``.

    Args:
        block_fn: ``block_fn(params_one_stage, x_mb) -> y_mb`` with
            ``y_mb.shape == x_mb.shape`` (chained stages).
        stacked_params: pytree whose leaves have leading axis S
            (= ``mesh.shape[axis]``); stage ``i`` uses slice ``i``.
        x: (B, ...) batch; split into ``num_microbatches`` microbatches
            (default: S, the classic GPipe choice).
        mesh: mesh containing ``axis``.

    Returns:
        (B, ...) output of the full chain, replicated over ``axis``.
    """
    num_stages = mesh.shape[axis]
    num_micro = num_microbatches or num_stages

    def per_shard(params, xs):
        local = jax.tree_util.tree_map(lambda p: p[0], params)
        return _pipeline_forward(
            block_fn, local, xs, axis=axis, num_stages=num_stages)

    fn = shard_map(
        per_shard, mesh=mesh,
        in_specs=(P(axis), P()), out_specs=P(),
        check_rep=False,
    )
    ys = fn(stacked_params, _split_micro(x, num_micro))
    return ys.reshape(x.shape[0], *ys.shape[2:])


def pipeline_value_and_grad(block_fn, loss_fn, *, mesh: Mesh,
                            axis: str = 'pipe',
                            num_microbatches: int = None):
    """Pipelined ``value_and_grad`` over a stacked-block model.

    Args:
        block_fn: per-stage forward (see :func:`pipeline_apply`).
        loss_fn: ``loss_fn(y, targets) -> scalar`` on the full chain's
            output (microbatch losses are averaged).

    Returns:
        ``fn(stacked_params, x, targets) -> (loss, grads)`` — grads
        have the stacked (S, ...) layout, each stage's slice held on
        its own device (sharded over ``axis``); loss is replicated.
        Bit-equal to the sequential (single-device) computation.
    """
    num_stages = mesh.shape[axis]
    num_micro = num_microbatches or num_stages

    def per_shard(params, xs, ts):
        def local_loss(local):
            ys = _pipeline_forward(
                block_fn, local, xs, axis=axis, num_stages=num_stages)
            losses = jax.vmap(loss_fn)(ys, ts)  # one loss per microbatch
            return jnp.mean(losses)

        local = jax.tree_util.tree_map(lambda p: p[0], params)
        loss, grads = jax.value_and_grad(local_loss)(local)
        # Under ``check_rep=False`` shard_map transposes ``psum`` to
        # ``psum`` (it cannot prove the cotangent is replicated), so
        # the single psum on the loss path — the output broadcast in
        # ``_pipeline_forward`` — multiplies every cotangent by S.
        # The cotangent IS replicated here (identical loss on every
        # stage), so undo the factor.  Pinned by the grad-equality
        # test in tests/test_parallel_pipeline.py.
        grads = jax.tree_util.tree_map(
            lambda g: (g / num_stages)[None], grads)
        return loss, grads

    fn = shard_map(
        per_shard, mesh=mesh,
        in_specs=(P(axis), P(), P()),
        out_specs=(P(), P(axis)),
        check_rep=False,
    )

    @functools.wraps(fn)
    def wrapped(stacked_params, x, targets):
        return fn(stacked_params, _split_micro(x, num_micro),
                  _split_micro(targets, num_micro))

    return wrapped


class PipelinedBlocks:
    """Stack S identical :class:`~padertorch_tpu.module.Module` blocks
    and run them pipelined over a ``pipe`` mesh axis (or sequentially
    when no mesh is given — same numerics, tested).

    The blocks must share one architecture (identical pytree
    structure); their parameters are stacked on a leading S axis, and
    each pipeline stage holds one slice.

    >>> # doctest-free usage sketch:
    >>> # blocks = [TransformerEncoderLayer(...) for _ in range(8)]
    >>> # trunk = PipelinedBlocks(blocks, mesh=mesh)
    >>> # y = trunk(x)    # (B, T, D) -> (B, T, D)
    """

    def __init__(self, blocks, mesh: Mesh = None, axis: str = 'pipe',
                 num_microbatches: int = None):
        from padertorch_tpu.module import partition
        assert len(blocks) >= 1
        parts = [partition(b) for b in blocks]
        params_list = [p for p, _ in parts]
        self._static = parts[0][1]
        treedef = jax.tree_util.tree_structure(params_list[0])
        # every stage runs with block 0's STATIC partition (buffers,
        # config scalars) — a block whose static values differ would
        # silently compute with block 0's, so refuse it loudly
        s_leaves, s_def = jax.tree_util.tree_flatten(self._static)
        for i, (p, s) in enumerate(parts[1:], 1):
            assert jax.tree_util.tree_structure(p) == treedef, \
                'pipelined blocks must share one architecture'
            leaves, sdef = jax.tree_util.tree_flatten(s)
            if sdef != s_def:
                raise ValueError(
                    f'pipelined block {i} has a different static '
                    f'structure than block 0')
            for a, b in zip(s_leaves, leaves):
                if hasattr(a, 'shape') or hasattr(b, 'shape'):
                    same = (
                        getattr(a, 'shape', None) == getattr(
                            b, 'shape', None)
                        and getattr(a, 'dtype', None) == getattr(
                            b, 'dtype', None)
                        and bool(jnp.all(
                            jnp.asarray(a) == jnp.asarray(b))))
                else:
                    same = a == b
                if not same:
                    raise ValueError(
                        f'pipelined block {i} differs from block 0 '
                        f'in a STATIC (non-parameter) value '
                        f'({a!r} vs {b!r}); all stages run with '
                        f'block 0 statics — make the differing value '
                        f'a parameter or use identical blocks')
        self.stacked_params = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *params_list)
        self.num_stages = len(blocks)
        self.mesh = mesh
        self.axis = axis
        self.num_microbatches = num_microbatches
        if mesh is not None:
            assert mesh.shape[axis] == len(blocks), (
                mesh.shape, len(blocks))

    def _block_fn(self, params_one, x):
        from padertorch_tpu.module import combine
        return combine(params_one, self._static)(x)

    def __call__(self, x):
        if self.mesh is None:
            # sequential fallback (single device / debugging)
            def body(h, params_i):
                return self._block_fn(params_i, h), None
            y, _ = jax.lax.scan(body, x, self.stacked_params)
            return y
        return pipeline_apply(
            self._block_fn, self.stacked_params, x, mesh=self.mesh,
            axis=self.axis, num_microbatches=self.num_microbatches)
