"""Tests for the pytree Module system (partition/combine/state_dict/jit)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import padertorch_tpu as pt
from padertorch_tpu.module import (
    Module, partition, combine, state_dict, load_state_dict, num_parameters,
)
from padertorch_tpu import nn
from padertorch_tpu import random as ptrandom


class Net(Module):
    def __init__(self, in_features=4, hidden=8, out=2):
        self.l1 = nn.Linear(in_features, hidden)
        self.l2 = nn.Linear(hidden, out)
        self.drop = nn.Dropout(0.5)
        self.name = 'net'
        self.scale = 2.0

    def forward(self, x):
        h = jax.nn.relu(self.l1(x))
        h = self.drop(h)
        return self.l2(h) * self.scale


def test_module_is_pytree():
    ptrandom.seed(0)
    net = Net()
    leaves = jax.tree_util.tree_leaves(net)
    # l1.w, l1.b, l2.w, l2.b
    assert len(leaves) == 4
    # static attrs not traced
    net2 = jax.tree_util.tree_map(lambda x: x * 0, net)
    assert net2.name == 'net'
    assert float(jnp.sum(jnp.abs(net2.l1.weight))) == 0.0


def test_deterministic_init():
    ptrandom.seed(42)
    a = Net()
    ptrandom.seed(42)
    b = Net()
    np.testing.assert_array_equal(a.l1.weight, b.l1.weight)
    ptrandom.seed(43)
    c = Net()
    assert not np.allclose(a.l1.weight, c.l1.weight)


def test_partition_combine_roundtrip():
    ptrandom.seed(0)
    net = Net()
    params, static = partition(net)
    restored = combine(params, static)
    np.testing.assert_array_equal(restored.l1.weight, net.l1.weight)
    assert restored.name == 'net'
    # params contains only trainable leaves
    n_params = len(jax.tree_util.tree_leaves(params))
    assert n_params == 4


class WithBuffer(Module):
    def __init__(self):
        self.w = jnp.ones((3,))
        self.register_buffer('running_mean', jnp.zeros((3,)))

    def forward(self, x):
        return x * self.w - self.running_mean


def test_buffers_are_frozen():
    m = WithBuffer()
    params, static = partition(m)
    leaves = jax.tree_util.tree_leaves(params)
    assert len(leaves) == 1  # only w
    assert static.running_mean is not None

    def loss(p):
        mod = combine(p, static)
        return jnp.sum(mod(jnp.ones((3,))))

    grads = jax.grad(loss)(params)
    g_leaves = jax.tree_util.tree_leaves(grads)
    assert len(g_leaves) == 1


def test_grad_through_module():
    ptrandom.seed(0)
    net = Net().eval()
    x = jnp.ones((2, 4))
    params, static = partition(net)

    def loss(p):
        return jnp.sum(combine(p, static)(x) ** 2)

    val, grads = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(val))
    assert jnp.shape(grads.l1.weight) == (4, 8)


def test_jit_caching_and_mode_flip():
    ptrandom.seed(0)
    net = Net()
    x = jnp.ones((2, 4))
    traces = []

    @jax.jit
    def f(m, x):
        traces.append(1)
        with ptrandom.key_context(jax.random.PRNGKey(0)):
            return m(x)

    f(net, x)
    f(net, x)
    assert len(traces) == 1  # cached
    net.eval()
    y1 = f(net, x)
    assert len(traces) == 2  # retrace on mode flip
    y2 = f(net, x)
    assert len(traces) == 2
    np.testing.assert_array_equal(y1, y2)  # eval deterministic


def test_dropout_train_vs_eval():
    ptrandom.seed(0)
    d = nn.Dropout(0.5)
    x = jnp.ones((1000,))
    with ptrandom.key_context(jax.random.PRNGKey(0)):
        y = d(x)
    assert float(jnp.mean(y == 0)) > 0.3
    # scale preserved in expectation
    assert abs(float(jnp.mean(y)) - 1.0) < 0.15
    d.eval()
    np.testing.assert_array_equal(d(x), x)


def test_state_dict_roundtrip():
    ptrandom.seed(0)
    net = Net()
    sd = state_dict(net)
    assert 'l1.weight' in sd and 'l2.bias' in sd
    zeroed = jax.tree_util.tree_map(lambda x: x * 0, net)
    restored = load_state_dict(zeroed, sd)
    np.testing.assert_array_equal(restored.l1.weight, net.l1.weight)


def test_state_dict_strict_errors():
    ptrandom.seed(0)
    net = Net()
    sd = state_dict(net)
    del sd['l1.weight']
    with pytest.raises(KeyError):
        load_state_dict(net, sd)


def test_num_parameters():
    ptrandom.seed(0)
    net = Net(4, 8, 2)
    assert num_parameters(net) == 4 * 8 + 8 + 8 * 2 + 2


def test_serialize_roundtrip(tmp_path):
    from padertorch_tpu.serialize import dump_state, load_state
    ptrandom.seed(0)
    net = Net()
    state = {
        'model': state_dict(net),
        'iteration': 7,
        'nested': {'lr': 1e-3, 'names': ['a', 'b'], 'flag': None},
    }
    path = tmp_path / 'ckpt_7.ptt'
    dump_state(state, path)
    loaded = load_state(path)
    assert loaded['iteration'] == 7
    assert loaded['nested'] == state['nested']
    np.testing.assert_array_equal(
        loaded['model']['l1.weight'], state['model']['l1.weight'])


def test_key_context_deterministic():
    with ptrandom.key_context(jax.random.PRNGKey(1)):
        k1 = ptrandom.next_key()
        k2 = ptrandom.next_key()
    with ptrandom.key_context(jax.random.PRNGKey(1)):
        k1b = ptrandom.next_key()
    np.testing.assert_array_equal(k1, k1b)
    assert not np.array_equal(k1, k2)
    with pytest.raises(RuntimeError):
        ptrandom.next_key()


def test_vmap_over_module_inputs():
    ptrandom.seed(0)
    net = Net().eval()
    x = jnp.ones((5, 2, 4))
    y = jax.vmap(net)(x)
    assert y.shape == (5, 2, 2)


def test_optional_none_attr_keeps_structure():
    ptrandom.seed(0)
    a = nn.Linear(3, 4, bias=False)
    params, static = partition(a)
    b = combine(params, static)
    assert b.bias is None
    np.testing.assert_array_equal(b.weight, a.weight)
