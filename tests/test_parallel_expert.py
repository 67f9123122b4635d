"""Expert parallelism (Switch MoE): sharded output must equal the
dense per-token expert computation; capacity dropping and the aux
loss follow Switch semantics."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from padertorch_tpu.parallel.expert import (
    switch_router, expert_parallel_ffn, init_moe_params,
)

E = 4


def _dense_reference(params, x):
    """Every token through its argmax expert, no capacity limit."""
    b, t, d = x.shape
    tokens = x.reshape(-1, d)
    probs = jax.nn.softmax(tokens @ params['router_w'], axis=-1)
    idx = jnp.argmax(probs, axis=-1)
    p = jnp.max(probs, axis=-1)
    outs = []
    for e in range(params['w1'].shape[0]):
        h = jax.nn.gelu(tokens @ params['w1'][e] + params['b1'][e])
        outs.append(h @ params['w2'][e] + params['b2'][e])
    outs = jnp.stack(outs)                       # (E, N, D)
    y = outs[idx, jnp.arange(tokens.shape[0])] * p[:, None]
    return y.reshape(b, t, d)


def test_moe_matches_dense_reference():
    params = init_moe_params(jax.random.PRNGKey(0), 8, 16, E)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 8, 8)).astype('float32'))
    # ample capacity: nothing dropped -> exact equality
    y, aux = expert_parallel_ffn(params, x, capacity_factor=float(E))
    want = _dense_reference(params, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(want),
                               rtol=1e-5, atol=1e-6)
    assert float(aux) > 0


def test_moe_sharded_matches_unsharded():
    devices = jax.devices()
    if len(devices) < E:
        pytest.skip(f'needs >= {E} devices')
    mesh = Mesh(np.asarray(devices[:E]), ('expert',))
    params = init_moe_params(jax.random.PRNGKey(1), 8, 16, E)
    x = jnp.asarray(np.random.default_rng(1).normal(
        size=(2, 8, 8)).astype('float32'))
    y0, aux0 = jax.jit(
        lambda p, x: expert_parallel_ffn(p, x, capacity_factor=4.0)
    )(params, x)
    y1, aux1 = jax.jit(
        lambda p, x: expert_parallel_ffn(
            p, x, mesh=mesh, capacity_factor=4.0)
    )(params, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=1e-5, atol=1e-6)
    assert float(aux1) == pytest.approx(float(aux0), rel=1e-6)


def test_capacity_drops_tokens():
    # route everything to one expert with a rigged router; capacity 1
    # keeps only the first token
    params = init_moe_params(jax.random.PRNGKey(2), 4, 8, E)
    params['router_w'] = jnp.zeros((4, E)).at[:, 0].set(10.0)
    x = jnp.ones((1, 6, 4), jnp.float32)
    dispatch, combine, _ = switch_router(
        x.reshape(-1, 4), params['router_w'], E, capacity=1)
    assert float(dispatch.sum()) == 1.0  # 1 token kept of 6
    y, _ = expert_parallel_ffn(
        params, x, capacity_factor=1.0 / 6 * E)  # capacity = 1... e=4
    # dropped tokens produce zero output
    out = np.asarray(y)[0]
    nonzero_rows = (np.abs(out) > 1e-9).any(-1)
    assert nonzero_rows.sum() <= 2


def test_router_positions_are_unique_per_expert():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(32, 8)).astype('float32'))
    w = jnp.asarray(rng.normal(size=(8, E)).astype('float32'))
    dispatch, _, _ = switch_router(x, w, E, capacity=16)
    # every (expert, slot) pair holds at most one token
    slot_occupancy = np.asarray(dispatch).sum(axis=0)  # (E, C)
    assert slot_occupancy.max() <= 1.0


def test_moe_gradients_flow():
    params = init_moe_params(jax.random.PRNGKey(4), 8, 16, E)
    x = jnp.asarray(np.random.default_rng(4).normal(
        size=(1, 8, 8)).astype('float32'))

    def loss(p):
        y, aux = expert_parallel_ffn(p, x, capacity_factor=4.0)
        return jnp.sum(y ** 2) + 0.01 * aux

    grads = jax.grad(loss)(params)
    for k, g in grads.items():
        assert np.isfinite(np.asarray(g)).all(), k
    # router receives gradient through the combine weights + aux loss
    assert float(jnp.abs(grads['router_w']).max()) > 0


def test_switch_router_bf16_tokens_exact_positions():
    """Regression: routing math must be f32/int32 even for bf16 tokens
    — a bf16 queue-position cumsum is unrepresentable past 256 tokens
    per expert (8 mantissa bits) and tokens silently collided in
    capacity slots under the bf16 policy."""
    rng = np.random.RandomState(0)
    n, d, e = 2048, 8, 2            # ~1024 tokens per expert queue
    x32 = jnp.asarray(rng.randn(n, d).astype('float32'))
    w = jnp.asarray(rng.randn(d, e).astype('float32') * 0.1)
    cap = 2048
    d32, c32, p32 = switch_router(x32, w, e, capacity=cap)
    d16, c16, p16 = switch_router(
        x32.astype(jnp.bfloat16), w.astype(jnp.bfloat16), e,
        capacity=cap)
    # every kept token occupies EXACTLY one slot, and no slot is
    # occupied twice (the bf16 collision signature)
    slot_occupancy = np.asarray(d16, 'float32').sum(axis=0)  # (E, C)
    assert slot_occupancy.max() <= 1.0 + 1e-6, slot_occupancy.max()
    per_token = np.asarray(d16, 'float32').sum(axis=(1, 2))
    np.testing.assert_allclose(per_token, 1.0, atol=1e-6)
    # routing decisions themselves match the f32 run except where the
    # bf16 INPUT rounding legitimately flips a near-tie logit
    agree = (np.asarray(p16).argmax(-1) == np.asarray(p32).argmax(-1))
    assert agree.mean() > 0.9, agree.mean()
