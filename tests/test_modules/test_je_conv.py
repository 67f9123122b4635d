"""Tests for contrib/je conv stacks (modeled on reference
contrib/je/tests/test_conv.py): shapes, length bookkeeping, norms."""
import numpy as np
import pytest

import jax.numpy as jnp

from padertorch_tpu import random as ptrandom
from padertorch_tpu.contrib.je.modules.conv import (
    Conv1d, Conv2d, ConvTranspose1d, CNN1d, CNN2d,
    compute_conv_out_size,
)


def test_conv1d_shapes_and_lengths():
    ptrandom.seed(0)
    conv = Conv1d(4, 8, 3, norm='sequence').eval()
    x = jnp.ones((2, 4, 20))
    y, lens = conv(x, seq_len=[20, 15])
    assert y.shape == (2, 8, 20)
    assert list(np.asarray(lens)) == [20, 15]
    # strided
    conv = Conv1d(4, 8, 3, stride=2).eval()
    y, lens = conv(x, seq_len=[20, 15])
    assert y.shape[-1] == compute_conv_out_size(20, 3, 1, 2, 'both')
    assert list(np.asarray(lens)) == [10, 8]


def test_conv1d_gated():
    ptrandom.seed(0)
    conv = Conv1d(4, 8, 3, gated=True).eval()
    y, _ = conv(jnp.ones((2, 4, 20)))
    assert y.shape == (2, 8, 20)


def test_conv_transpose_inverts_stride():
    ptrandom.seed(0)
    down = Conv1d(4, 8, 4, stride=2).eval()
    up = ConvTranspose1d(8, 4, 4, stride=2).eval()
    x = jnp.ones((2, 4, 16))
    y, lens = down(x, seq_len=[16, 12])
    z, lens_up = up(y, seq_len=lens)
    assert z.shape[-1] >= 16


def test_cnn1d_stack():
    ptrandom.seed(0)
    cnn = CNN1d(4, [8, 16, 16], 3, norm='batch', pool_size=[1, 2, 1])
    cnn = cnn.eval()
    x = jnp.ones((2, 4, 32))
    y, lens = cnn(x, seq_len=[32, 24])
    assert y.shape[:2] == (2, 16)
    assert y.shape[-1] == 16  # one pool by 2
    assert list(np.asarray(lens)) == [16, 12]


def test_cnn2d_stack_with_residual():
    ptrandom.seed(0)
    cnn = CNN2d(1, [8, 8, 8], 3, residual_connections=[2, None, None])
    cnn = cnn.eval()
    x = jnp.ones((2, 1, 16, 32))
    y, lens = cnn(x, seq_len=[32, 20])
    assert y.shape == (2, 8, 16, 32)


def test_cnn_trains():
    import jax
    from padertorch_tpu.module import partition, combine
    ptrandom.seed(0)
    cnn = CNN1d(4, [8, 8], 3, norm='sequence')
    params, static = partition(cnn)
    x = jnp.ones((2, 4, 16))

    def loss(p):
        y, _ = combine(p, static)(x, seq_len=[16, 12])
        return jnp.mean(y ** 2)

    g = jax.grad(loss)(params)
    total = sum(float(jnp.sum(jnp.abs(v)))
                for v in jax.tree_util.tree_leaves(g))
    assert np.isfinite(total) and total > 0
