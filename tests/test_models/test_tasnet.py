"""TasNet smoke tests: config round trip, forward shapes, losses, variants."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from padertorch_tpu import random as ptrandom
from padertorch_tpu.models.tasnet import (
    TasNet, TasEncoder, TasDecoder, StftEncoder, IstftDecoder,
)
from padertorch_tpu.modules.convnet import ConvNet


def small_tasnet(**updates):
    ptrandom.seed(0)
    return TasNet.new({
        'encoder': {'factory': TasEncoder, 'feature_size': 32},
        'separator': {
            'factory': 'padertorch_tpu.modules.dual_path_rnn.DPRNN',
            'input_size': 16, 'rnn_size': 8,
            'window_length': 10, 'hop_size': 5, 'num_blocks': 2,
        },
        **updates,
    })


def batch(b=2, k=2, t=800):
    rng = np.random.RandomState(0)
    return {
        'y': jnp.asarray(rng.randn(b, t).astype('float32')),
        's': jnp.asarray(rng.randn(b, k, t).astype('float32')),
        'num_samples': jnp.asarray([t, t - 100][:b]),
    }


def test_config_defaults():
    config = TasNet.get_config()
    assert config['encoder']['factory'].endswith('TasEncoder')
    assert config['decoder']['window_length'] == \
        config['encoder']['window_length']


def test_forward_and_loss():
    model = small_tasnet().eval()
    b = batch()
    out = model(b)
    assert out['out'].shape == (2, 2, 800)
    review = model.review(b, out)
    assert set(review['losses']) == {'si-sdr', 'log-mse', 'log1p-mse'}
    for v in review['losses'].values():
        assert np.isfinite(float(v)), review['losses']


def test_oracle_separation_has_low_loss():
    """Feeding the targets as estimates through the loss -> very low si-sdr."""
    model = small_tasnet().eval()
    b = batch()
    out = {'out': b['s']}
    losses = model.loss(b, out)
    assert float(losses['si-sdr']) < -50  # near-perfect


def test_jit_forward_with_snapshots():
    model = small_tasnet().eval()
    model.create_snapshot = True
    b = batch()

    @jax.jit
    def f(b):
        out = model(b)
        return model.review(b, out)

    review = f(b)
    assert 'snapshots' in review
    summary = {
        'scalars': {}, 'buffers': {}, 'audios': {}, 'images': {},
        'snapshots': dict(review['snapshots']),
    }
    summary = model.modify_summary(summary)
    assert len(summary['snapshots']) == 0
    assert 'observation' in summary['audios']


def test_stft_coders_roundtrip():
    ptrandom.seed(0)
    enc = StftEncoder(feature_size=258)
    dec = IstftDecoder(feature_size=258)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 6, 203), 'float32')
    encoded, num_frames = enc(x, jnp.asarray([203, 150]))
    assert encoded.shape == (2, 6, 258, 20)
    assert num_frames.tolist() == [20, 14]
    decoded = dec(encoded)
    # reconstruction of the interior (no fading -> edges lossy)
    np.testing.assert_allclose(
        np.asarray(decoded[..., 20:180]), np.asarray(x[..., 20:180]),
        atol=1e-3)


def test_convnet_separator_variant():
    ptrandom.seed(0)
    model = TasNet.new({
        'encoder': {'factory': TasEncoder, 'feature_size': 32},
        'separator': {
            'factory': ConvNet,
            'input_size': 32, 'num_blocks': 2, 'num_repeats': 1,
            'hidden_channels': 16,
        },
    }).eval()
    out = model(batch())
    assert out['out'].shape == (2, 2, 800)
