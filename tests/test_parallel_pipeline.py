"""Pipeline parallelism: GPipe schedule over a virtual 'pipe' mesh must
be bit-equal to running the stacked blocks sequentially on one device
(forward, loss and per-stage grads)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from padertorch_tpu.parallel.pipeline import (
    pipeline_apply, pipeline_value_and_grad,
)

S = 4  # pipeline stages


def _mesh():
    devices = jax.devices()
    if len(devices) < S:
        pytest.skip(f'needs >= {S} devices')
    return Mesh(np.asarray(devices[:S]), ('pipe',))


def _block(params, x):
    # one residual MLP block: x + tanh(x @ w + b)
    return x + jnp.tanh(x @ params['w'] + params['b'])


def _stacked_params(d=8, seed=0):
    rng = np.random.default_rng(seed)
    return {
        'w': jnp.asarray(
            rng.normal(scale=0.3, size=(S, d, d)).astype('float32')),
        'b': jnp.asarray(
            rng.normal(scale=0.1, size=(S, d)).astype('float32')),
    }


def _sequential(params, x):
    for i in range(S):
        x = _block(
            jax.tree_util.tree_map(lambda p: p[i], params), x)
    return x


def test_pipeline_apply_matches_sequential():
    mesh = _mesh()
    params = _stacked_params()
    x = jnp.asarray(
        np.random.default_rng(1).normal(size=(8, 8)).astype('float32'))
    want = _sequential(params, x)
    got = pipeline_apply(_block, params, x, mesh=mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_pipeline_apply_microbatch_count():
    mesh = _mesh()
    params = _stacked_params(seed=2)
    x = jnp.asarray(
        np.random.default_rng(3).normal(size=(8, 8)).astype('float32'))
    want = _sequential(params, x)
    for m in (2, 8):
        got = pipeline_apply(
            _block, params, x, mesh=mesh, num_microbatches=m)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-6)


def test_pipeline_value_and_grad_matches_sequential():
    mesh = _mesh()
    params = _stacked_params(seed=4)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(8, 8)).astype('float32'))
    t = jnp.asarray(rng.normal(size=(8, 8)).astype('float32'))

    def loss_fn(y, targets):
        return jnp.mean((y - targets) ** 2)

    def seq_loss(p):
        # identical microbatch-mean structure as the pipeline
        xs = x.reshape(S, -1, 8)
        ts = t.reshape(S, -1, 8)
        return jnp.mean(jax.vmap(
            lambda xi, ti: loss_fn(_sequential(p, xi), ti))(xs, ts))

    want_loss, want_grads = jax.value_and_grad(seq_loss)(params)

    fn = jax.jit(pipeline_value_and_grad(_block, loss_fn, mesh=mesh))
    got_loss, got_grads = fn(params, x, t)
    np.testing.assert_allclose(float(got_loss), float(want_loss),
                               rtol=1e-6)
    for k in params:
        np.testing.assert_allclose(
            np.asarray(got_grads[k]), np.asarray(want_grads[k]),
            rtol=1e-5, atol=1e-6)


def test_pipeline_training_reduces_loss():
    mesh = _mesh()
    params = _stacked_params(seed=6)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(8, 8)).astype('float32'))
    t = jnp.asarray(rng.normal(size=(8, 8)).astype('float32'))

    fn = jax.jit(pipeline_value_and_grad(
        _block, lambda y, ti: jnp.mean((y - ti) ** 2), mesh=mesh))
    losses = []
    for _ in range(10):
        loss, grads = fn(params, x, t)
        losses.append(float(loss))
        params = jax.tree_util.tree_map(
            lambda p, g: p - 0.1 * g, params, grads)
    assert losses[-1] < losses[0] * 0.9, losses


def test_pipelined_blocks_module_wrapper():
    from padertorch_tpu import random as ptrandom
    from padertorch_tpu import nn
    from padertorch_tpu.base import Module
    from padertorch_tpu.parallel.pipeline import PipelinedBlocks

    class Block(Module):
        def __init__(self, d):
            self.lin = nn.Linear(d, d)

        def forward(self, x):
            return x + jnp.tanh(self.lin(x))

    ptrandom.seed(0)
    blocks = [Block(8) for _ in range(S)]
    x = jnp.asarray(
        np.random.default_rng(8).normal(size=(8, 8)).astype('float32'))
    want = x
    for b in blocks:
        want = b(want)

    seq = PipelinedBlocks(blocks)          # no mesh: sequential scan
    np.testing.assert_allclose(np.asarray(seq(x)), np.asarray(want),
                               rtol=1e-6, atol=1e-6)
    mesh = _mesh()
    piped = PipelinedBlocks(blocks, mesh=mesh)
    np.testing.assert_allclose(np.asarray(piped(x)), np.asarray(want),
                               rtol=1e-6, atol=1e-6)
