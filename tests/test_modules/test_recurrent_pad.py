"""Pallas hidden-padding (MXU tile alignment) is semantically exact."""
import numpy as np
import jax
import jax.numpy as jnp

from padertorch_tpu import random as ptrandom
from padertorch_tpu.modules.recurrent import LSTM
from padertorch_tpu.module import partition, combine


def _run(pad):
    ptrandom.seed(0)
    lstm = LSTM(input_size=5, hidden_size=6, num_layers=2,
                bidirectional=True).eval()
    lstm.backend = 'pallas'
    lstm.pallas_pad_hidden_multiple = pad
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(3, 12, 5)).astype('float32'))
    lens = jnp.asarray([12, 9, 7])
    params, static = partition(lstm)

    def loss(params):
        out, _ = combine(params, static)(x, seq_lens=lens)
        return jnp.sum(out ** 2), out

    (l, out), grads = jax.value_and_grad(loss, has_aux=True)(params)
    return l, out, grads


def test_hidden_padding_is_exact():
    l0, o0, g0 = _run(None)
    l1, o1, g1 = _run(8)
    assert float(l0) == float(l1)
    np.testing.assert_array_equal(np.asarray(o0), np.asarray(o1))
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6)
