"""Reference model family of the distance estimator recipe
(ref contrib/examples/source_localization/distance_estimator/model.py).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from padertorch_tpu import random as ptrandom
from padertorch_tpu.contrib.examples.source_localization.\
    distance_estimator.model import (
        SamePadding, Pool, Conv1D, Conv2D, CNN1D, CNN2D, HybridCNN,
        GRU, CRNN, DistanceEstimator)


def test_same_padding_matches_torch_rule():
    import torch
    x = np.random.RandomState(0).randn(2, 3, 11).astype('float32')
    for k in (2, 3, 4, 5):
        got = np.asarray(SamePadding([k])(jnp.asarray(x)))
        pl, pr = SamePadding.split_padding(k)
        want = torch.nn.ConstantPad1d((pl, pr), 0.)(
            torch.from_numpy(x)).numpy()
        np.testing.assert_array_equal(got, want)
        # conv with that padding keeps the length
        assert got.shape[-1] - (k - 1) == x.shape[-1]


def test_pool_matches_torch():
    import torch
    x = np.random.RandomState(1).randn(2, 3, 9, 13).astype('float32')
    for pool_type in ('max', 'avg'):
        got = np.asarray(
            Pool(pool_type, [2, 3])(jnp.asarray(x)))
        cls = (torch.nn.MaxPool2d if pool_type == 'max'
               else torch.nn.AvgPool2d)
        want = cls((2, 3))(torch.from_numpy(x)).numpy()
        np.testing.assert_allclose(got, want, atol=1e-6)


def test_conv_blocks_shapes_and_glu():
    ptrandom.seed(0)
    x = jnp.ones((2, 3, 16))
    c = Conv1D(3, 8, [5], batch_norm=True, pre_activation=True)
    assert c(x).shape == (2, 8, 16)
    g = Conv1D(3, 8, [5], activation_fn='glu')
    assert g(x).shape == (2, 8, 16)
    x2 = jnp.ones((2, 1, 12, 16))
    c2 = Conv2D(1, 4, [3, 3], batch_norm=False, padding=False)
    assert c2(x2).shape == (2, 4, 10, 14)


def test_hybrid_cnn_config_wires_channels():
    cfg = HybridCNN.get_config({'n_freq_bins': 257})
    # 257 bins / pool 4 -> 64; 16 out channels -> 1024 1-d inputs
    assert cfg['cnn_1d']['n_chs_input'] == 16 * 64
    ptrandom.seed(0)
    net = HybridCNN.from_config(cfg)
    y = net(jnp.ones((2, 1, 257, 20)))
    assert y.shape == (2, 32, 20)


def test_crnn_and_distance_estimator_end_to_end():
    ptrandom.seed(0)
    cfg = DistanceEstimator.get_config({
        'num_cls': 11,
        'net': {'cnn': {'n_freq_bins': 33},
                'fcn': {'output_size': 11, 'dropout': 0.0}},
    })
    assert cfg['net']['fcn']['output_size'] == 11
    model = DistanceEstimator.from_config(cfg)
    inputs = {
        'features': jnp.ones((3, 1, 33, 12)),
        'label': jnp.asarray([0, 5, 10]),
        'distance': jnp.asarray([0.0, 0.5, 1.0]),
    }
    logits = model(inputs)
    assert logits.shape == (3, 11)
    review = model.review(inputs, logits)
    assert np.isfinite(float(review['loss']))
    assert review['scalars']['mae'].shape == (3,)


def test_modify_summary_reference_semantics():
    m = DistanceEstimator.__new__(DistanceEstimator)
    summary = {'scalars': {
        'target': [np.asarray([3, 4, 7])],
        'est_cls': [np.asarray([3, 5, 1])],
        'rmse': [np.asarray([4.0, 16.0, 0.0])],
    }, 'histograms': {}, 'buffers': {}, 'snapshots': {}}
    out = DistanceEstimator.modify_summary(m, summary)
    s = out['scalars']
    # exact (1/3) and +-1-neighbor (2/3) accuracy
    np.testing.assert_allclose(np.mean(s['acc']), 1 / 3)
    np.testing.assert_allclose(np.mean(s['acc_allow_neighbors']), 2 / 3)
    np.testing.assert_allclose(s['rmse'], np.sqrt(np.mean([4, 16, 0])))


def test_distance_estimator_learns():
    ptrandom.seed(0)
    import jax
    from padertorch_tpu.module import partition, combine
    model = DistanceEstimator.from_config(DistanceEstimator.get_config({
        'num_cls': 4,
        'net': {
            'fcn': {'output_size': 4, 'dropout': 0.0},
            'cnn': {
                'n_freq_bins': 9,
                'cnn_2d': {'n_chs': [4, 4],
                           'kernel_sizes': [[3, 3], [3, 3]],
                           'pool_layers': [None, None]},
            },
            'gru': {'hidden_size': 8},
        },
    }))
    rng = np.random.RandomState(0)
    feats = rng.randn(8, 1, 9, 6).astype('float32')
    labels = rng.randint(0, 4, size=8)
    feats[np.arange(8), 0, 0, 0] = labels * 3.0  # learnable cue
    inputs = {
        'features': jnp.asarray(feats),
        'label': jnp.asarray(labels),
        'distance': jnp.asarray(labels * 0.1),
    }
    params, static = partition(model)

    @jax.jit
    def loss_fn(p):
        m = combine(p, static)
        return m.review(inputs, m(inputs))['loss']

    l0 = float(loss_fn(params))
    grad = jax.jit(jax.grad(loss_fn))
    for _ in range(25):
        params = jax.tree.map(lambda p, g: p - 0.05 * g,
                              params, grad(params))
    l1 = float(loss_fn(params))
    assert l1 < l0 * 0.8, (l0, l1)
