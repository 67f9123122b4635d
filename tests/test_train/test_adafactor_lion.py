"""Adafactor / Lion wrapper tests: factored-state memory, trajectory
equality vs raw optax, Trainer integration, checkpoint round trip."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import padertorch_tpu as pt


def _quadratic_params():
    rng = np.random.RandomState(0)
    return {
        'w': jnp.asarray(rng.randn(256, 512).astype('float32')),
        'b': jnp.asarray(rng.randn(512).astype('float32')),
    }


def _grads(params):
    # grad of 0.5 * ||p||^2 plus a fixed offset (deterministic, dense)
    return jax.tree_util.tree_map(lambda p: p + 0.1, params)


def test_adafactor_state_is_factored():
    params = _quadratic_params()
    opt = pt.Adafactor(lr=1e-3)
    opt.set_parameters(params)
    shapes = [leaf.shape for leaf in
              jax.tree_util.tree_leaves(opt.opt_state)
              if hasattr(leaf, 'shape')]
    # second moment of the (256, 512) weight is stored as factored row/
    # col statistics -- the full matrix must NOT appear in the state
    assert (256, 512) not in shapes, shapes
    assert any(s[-1] == 256 for s in shapes if len(s) >= 1), shapes
    assert any(s[-1] == 512 for s in shapes if len(s) >= 1), shapes


def test_adafactor_matches_raw_optax_trajectory():
    params = _quadratic_params()
    leaves = jax.tree_util.tree_leaves(params)

    opt = pt.Adafactor(lr=1e-3)  # default huge clipping: no-op
    opt.set_parameters(params)

    ref_tx = optax.adafactor(1e-3)
    ref_state = ref_tx.init(leaves)
    ref_params = params

    p = params
    for _ in range(5):
        p, _ = opt.apply(p, _grads(p))
        g_leaves = jax.tree_util.tree_leaves(_grads(ref_params))
        r_leaves = jax.tree_util.tree_leaves(ref_params)
        updates, ref_state = ref_tx.update(g_leaves, ref_state, r_leaves)
        new_leaves = optax.apply_updates(r_leaves, updates)
        ref_params = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(ref_params), new_leaves)

    for a, b in zip(jax.tree_util.tree_leaves(p),
                    jax.tree_util.tree_leaves(ref_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_lion_matches_raw_optax_trajectory():
    params = _quadratic_params()
    opt = pt.Lion(lr=1e-4, weight_decay=0.01)
    opt.set_parameters(params)

    ref_tx = optax.lion(1e-4, weight_decay=0.01)
    ref_state = ref_tx.init(jax.tree_util.tree_leaves(params))
    ref_params = params

    p = params
    for _ in range(5):
        p, _ = opt.apply(p, _grads(p))
        g_leaves = jax.tree_util.tree_leaves(_grads(ref_params))
        r_leaves = jax.tree_util.tree_leaves(ref_params)
        updates, ref_state = ref_tx.update(g_leaves, ref_state, r_leaves)
        new_leaves = optax.apply_updates(r_leaves, updates)
        ref_params = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(ref_params), new_leaves)

    for a, b in zip(jax.tree_util.tree_leaves(p),
                    jax.tree_util.tree_leaves(ref_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize('optimizer', ['adafactor', 'lion'])
def test_trains_mnist(tmp_path, optimizer):
    from tests.test_train.test_trainer import (
        MnistModel, get_datasets)
    from padertorch_tpu import random as ptrandom
    ptrandom.seed(0)
    opt = (pt.Adafactor(lr=1e-2) if optimizer == 'adafactor'
           else pt.Lion(lr=1e-3))
    trainer = pt.Trainer(
        model=MnistModel(), storage_dir=tmp_path / 'exp',
        optimizer=opt, stop_trigger=(2, 'epoch'))
    tr, dt = get_datasets()
    trainer.test_run(tr, dt)


def test_adafactor_state_dict_roundtrip():
    params = _quadratic_params()
    opt = pt.Adafactor(lr=1e-3)
    opt.set_parameters(params)
    p, _ = opt.apply(params, _grads(params))
    sd = opt.state_dict()

    opt2 = pt.Adafactor(lr=1e-3)
    opt2.set_parameters(params)
    opt2.load_state_dict(sd)
    a, _ = opt.apply(p, _grads(p))
    b, _ = opt2.apply(p, _grads(p))
    for x, y in zip(jax.tree_util.tree_leaves(a),
                    jax.tree_util.tree_leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_adafactor_lr_schedule_via_property():
    params = _quadratic_params()
    opt = pt.Adafactor(lr=1e-3)
    opt.set_parameters(params)
    assert opt.lr == pytest.approx(1e-3)
    opt.lr = 1e-4  # annealing hooks drive this setter
    assert opt.lr == pytest.approx(1e-4)
    opt.apply(params, _grads(params))
