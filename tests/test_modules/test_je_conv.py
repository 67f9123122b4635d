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


def test_resnet50_plan():
    """Faithful reference plan: 50 layers, bottleneck residuals with
    projected skips, global avg pool (reference je/modules/conv.py:970).
    """
    import numpy as np
    import jax.numpy as jnp
    from padertorch_tpu import random as ptrandom
    from padertorch_tpu.contrib.je.modules.conv import resnet50
    ptrandom.seed(0)
    net = resnet50(3, 10, out_pool_size=2, norm=None)
    assert len(net.convs) == 50
    # 16 bottleneck saves; only channel/stride mismatches get skip convs
    assert sum(len(d) for d in net.residual_connections) == 16
    assert len(net.residual_skip_convs) == 5
    x = jnp.asarray(np.random.RandomState(0).randn(1, 3, 64, 64),
                    'float32')
    # jit the forward: 50 eager conv dispatches on CPU cost ~1 min
    from padertorch_tpu.module import partition, combine
    params, static = partition(net)
    import jax
    y, _ = jax.jit(
        lambda p, x: combine(p, static)(x))(params, x)
    assert y.shape == (1, 10, 1, 1)


def test_cnn_residual_projection_and_receptive_field():
    import jax.numpy as jnp
    from padertorch_tpu import random as ptrandom
    from padertorch_tpu.contrib.je.modules.conv import CNN1d
    ptrandom.seed(0)
    # channel change across the skip -> a 1x1 projection must exist
    cnn = CNN1d(4, [8, 16, 16], 3, residual_connections=[2, None, None])
    assert '0->2' in cnn.residual_skip_convs
    o, sl = cnn(jnp.ones((1, 4, 32)), seq_len=[32])
    assert o.shape == (1, 16, 32) and list(sl) == [32]
    rf = cnn.get_receptive_field()
    assert rf[0] == 7  # three stacked 3-convs
