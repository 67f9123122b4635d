"""Unpool1d/2d parity and round-trip tests.

Golden oracle: torch ``MaxPool{1,2}d(return_indices=True)`` +
``MaxUnpool{1,2}d`` (the ops the reference's
``contrib/je/modules/conv_utils.py:142,221`` wrap).
"""
import numpy as np
import pytest

from padertorch_tpu.contrib.je.modules.conv import (
    Pool1d, Pool2d, Unpool1d, Unpool2d, compute_transpose_out_size,
)


def test_pool1d_indices_match_torch():
    torch = pytest.importorskip('torch')
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 3, 17)).astype(np.float32)
    for k, s in [(2, 2), (3, 2), (4, 4)]:
        y, _, idx = Pool1d(pool_type='max', pool_size=k, pool_stride=s)(
            x, return_indices=True)
        ty, tidx = torch.nn.MaxPool1d(k, stride=s, return_indices=True)(
            torch.as_tensor(x))
        np.testing.assert_allclose(np.asarray(y), ty.numpy(), rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(idx), tidx.numpy())


def test_unpool1d_round_trip_matches_torch():
    torch = pytest.importorskip('torch')
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 3, 16)).astype(np.float32)
    k = 2
    y, _, idx = Pool1d(pool_type='max', pool_size=k)(
        x, return_indices=True)
    up, _ = Unpool1d(pool_size=k)(np.asarray(y), indices=np.asarray(idx))
    ty, tidx = torch.nn.MaxPool1d(k, return_indices=True)(
        torch.as_tensor(x))
    tup = torch.nn.MaxUnpool1d(k)(ty, tidx)
    np.testing.assert_allclose(np.asarray(up), tup.numpy(), rtol=1e-6)


def test_pool2d_indices_match_torch():
    torch = pytest.importorskip('torch')
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 2, 12, 10)).astype(np.float32)
    for k, s in [((2, 2), (2, 2)), ((3, 2), (2, 2))]:
        y, _, idx = Pool2d(pool_type='max', pool_size=k, pool_stride=s)(
            x, return_indices=True)
        ty, tidx = torch.nn.MaxPool2d(k, stride=s, return_indices=True)(
            torch.as_tensor(x))
        np.testing.assert_allclose(np.asarray(y), ty.numpy(), rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(idx), tidx.numpy())


def test_unpool2d_round_trip_matches_torch():
    torch = pytest.importorskip('torch')
    rng = np.random.default_rng(3)
    x = rng.normal(size=(1, 2, 8, 6)).astype(np.float32)
    y, _, idx = Pool2d(pool_type='max', pool_size=2)(
        x, return_indices=True)
    up, _ = Unpool2d(pool_size=2)(np.asarray(y), indices=np.asarray(idx))
    ty, tidx = torch.nn.MaxPool2d(2, return_indices=True)(
        torch.as_tensor(x))
    tup = torch.nn.MaxUnpool2d(2)(ty, tidx)
    np.testing.assert_allclose(np.asarray(up), tup.numpy(), rtol=1e-6)


def test_unpool_nearest_upsample_and_lengths():
    x = np.arange(12, dtype=np.float32).reshape(1, 2, 6)
    up, seq_len = Unpool1d(pool_size=2)(x, seq_len=np.array([5, 6]))
    assert up.shape == (1, 2, 12)
    np.testing.assert_array_equal(np.asarray(up)[0, 0, :4], [0, 0, 1, 1])
    np.testing.assert_array_equal(seq_len, [9 + 1, 11 + 1])


def test_unpool2d_nearest_upsample():
    x = np.ones((1, 1, 3, 4), np.float32)
    up, _ = Unpool2d(pool_size=(2, 3))(x)
    assert up.shape == (1, 1, 6, 12)


def test_pool_unpool_length_inverse_with_padding():
    # 'both' padding: pooled lengths then unpooled lengths recover the
    # padded-to-multiple length.
    for n in [7, 8, 9, 12]:
        pooled = Pool1d(pool_type='max', pool_size=2, pad_type='both')(
            np.zeros((1, 1, n), np.float32), seq_len=np.array([n]))[1]
        restored = compute_transpose_out_size(pooled, 2, 1, 2, 'both')
        assert restored[0] >= n, (n, pooled, restored)


def test_unpool_identity_when_pool_size_1():
    x = np.ones((1, 2, 5), np.float32)
    up, seq_len = Unpool1d(pool_size=1)(x, seq_len=np.array([4]))
    assert up.shape == x.shape and seq_len[0] == 4


def test_pad_trim_reference_semantics():
    import numpy as np
    import jax.numpy as jnp
    from padertorch_tpu.contrib.je.modules.conv import Pad, Trim

    x = jnp.asarray(np.arange(8, dtype='float32')).reshape(1, 1, 8)
    # 'both' odd size: end gets one more than front
    p = Pad(side='both')(x, 3)
    assert p.shape == (1, 1, 11)
    assert p[0, 0, 0] == 0 and p[0, 0, 1] == 0  # 1 front, 2 end
    np.testing.assert_array_equal(np.asarray(p[0, 0, 1:9]), np.arange(8))
    # trim inverts pad for matching side/size
    t = Trim(side='both')(p, 3)
    np.testing.assert_array_equal(np.asarray(t[0, 0]), np.arange(8))
    # front/end sides
    np.testing.assert_array_equal(
        np.asarray(Trim(side='front')(x, 2)[0, 0]), np.arange(2, 8))
    np.testing.assert_array_equal(
        np.asarray(Trim(side='end')(x, 2)[0, 0]), np.arange(6))
    # replicate mode maps to edge padding
    r = Pad(side='end', mode='replicate')(x, 2)
    assert r[0, 0, -1] == 7 and r[0, 0, -2] == 7
    # 2d input with per-axis sides
    x2 = jnp.ones((1, 1, 4, 6))
    p2 = Pad(side=('front', 'end'))(x2, (2, 3))
    assert p2.shape == (1, 1, 6, 9)
    assert Trim(side=(None, 'both'))(p2, (0, 2)).shape == (1, 1, 6, 7)
