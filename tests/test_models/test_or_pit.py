import numpy as np
import jax.numpy as jnp

from padertorch_tpu import random as ptrandom
from padertorch_tpu.models.or_pit import OneAndRestPIT
from padertorch_tpu.models.tasnet import TasNet, TasEncoder


def small():
    ptrandom.seed(0)
    return OneAndRestPIT.new({
        'separator': {
            'factory': TasNet,
            'encoder': {'factory': TasEncoder, 'feature_size': 32},
            'separator': {
                'factory': 'padertorch_tpu.modules.dual_path_rnn.DPRNN',
                'input_size': 16, 'rnn_size': 8,
                'window_length': 10, 'hop_size': 5, 'num_blocks': 1,
            },
            'num_speakers': 2,
        },
    }).eval()


def test_forward_and_loss():
    model = small()
    rng = np.random.RandomState(0)
    batch = {
        'y': jnp.asarray(rng.randn(2, 400), 'float32'),
        's': jnp.asarray(rng.randn(2, 3, 400), 'float32'),
        'num_samples': jnp.asarray([400, 300]),
    }
    out = model(batch)
    assert out['one'].shape == (2, 400)
    review = model.review(batch, out)
    assert np.isfinite(float(review['loss']))


def test_recursive_separation():
    model = small()
    rng = np.random.RandomState(0)
    batch = {
        'y': jnp.asarray(rng.randn(1, 400), 'float32'),
        'num_samples': jnp.asarray([400]),
    }
    est = model.separate(batch, num_speakers=3)
    assert est.shape == (1, 3, 400)
