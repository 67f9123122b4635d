"""BSS model smoke tests, modeled on reference ``tests/test_models/test_bss.py``:
forward shapes, review keys, batch==mean-of-singles, eval determinism."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from padertorch_tpu import random as ptrandom
from padertorch_tpu.models.bss import (
    PermutationInvariantTrainingModel, DeepClusteringModel,
)

B, T, K, F, E = 4, 40, 2, 33, 10
NUM_FRAMES = [40, 30, 25, 20]


def pit_inputs():
    rng = np.random.RandomState(0)

    def padded(shape_fn):
        out = np.zeros(shape_fn(T), dtype='float32')
        for b, n in enumerate(NUM_FRAMES):
            out[b, :n] = np.abs(rng.randn(*shape_fn(n)[1:])).astype(
                'float32')
        return out

    return {
        'Y_abs': jnp.asarray(padded(lambda t: (B, t, F))),
        'X_abs': jnp.asarray(padded(lambda t: (B, t, K, F))),
        'cos_phase_difference': jnp.asarray(padded(lambda t: (B, t, K, F))),
        'num_frames': jnp.asarray(NUM_FRAMES),
    }


@pytest.fixture
def pit_model():
    ptrandom.seed(0)
    return PermutationInvariantTrainingModel(
        F=F, recurrent_layers=2, units=16, K=K).eval()


def test_pit_forward_shapes(pit_model):
    out = pit_model(pit_inputs())
    assert out.shape == (B, T, K, F)


def test_pit_review_keys(pit_model):
    inputs = pit_inputs()
    review = pit_model.review(inputs, pit_model(inputs))
    assert set(review['losses']) == {'pit_mse_loss', 'pit_ips_loss'}
    for v in review['losses'].values():
        assert jnp.ndim(v) == 0
        assert np.isfinite(float(v))


def test_pit_batch_equals_mean_of_singles(pit_model):
    """Reference contract (test_bss.py:153-192): the batched loss equals
    the mean of per-example losses (padding must not leak)."""
    inputs = pit_inputs()
    review = pit_model.review(inputs, pit_model(inputs))
    batched = float(review['losses']['pit_mse_loss'])
    singles = []
    for b, n in enumerate(NUM_FRAMES):
        single = {
            'Y_abs': inputs['Y_abs'][b:b + 1, :n],
            'X_abs': inputs['X_abs'][b:b + 1, :n],
            'cos_phase_difference':
                inputs['cos_phase_difference'][b:b + 1, :n],
            'num_frames': jnp.asarray([n]),
        }
        r = pit_model.review(single, pit_model(single))
        singles.append(float(r['losses']['pit_mse_loss']))
    np.testing.assert_allclose(batched, np.mean(singles), rtol=1e-4)


def test_pit_eval_deterministic(pit_model):
    inputs = pit_inputs()
    out1 = pit_model(inputs)
    out2 = pit_model(inputs)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))


def test_pit_grad_flows(pit_model):
    from padertorch_tpu.module import partition, combine
    inputs = pit_inputs()
    params, static = partition(pit_model)

    def loss(p):
        m = combine(p, static)
        r = m.review(inputs, m(inputs))
        return sum(r['losses'].values())

    g = jax.grad(loss)(params)
    total = sum(
        float(jnp.sum(jnp.abs(x))) for x in jax.tree_util.tree_leaves(g))
    assert np.isfinite(total) and total > 0


def test_dc_forward_and_review():
    ptrandom.seed(1)
    model = DeepClusteringModel(F=F, recurrent_layers=1, units=16, E=E)
    model = model.eval()
    rng = np.random.RandomState(0)
    inputs = {
        'Y_abs': jnp.asarray(
            np.abs(rng.randn(B, T, F)).astype('float32')),
        'target_mask': jnp.asarray(
            rng.choice([0.0, 1.0], size=(B, T, K, F)).astype('float32')),
        'num_frames': jnp.asarray([T] * B),
    }
    out = model(inputs)
    assert out.shape == (B, T, E, F)
    # unit norm over embedding axis
    norms = np.asarray(jnp.linalg.norm(out, axis=2))
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)
    review = model.review(inputs, out)
    assert 'dc_loss' in review['losses']
    assert np.isfinite(float(review['losses']['dc_loss']))
