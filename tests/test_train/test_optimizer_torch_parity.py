"""Optimizer updates must match torch.optim semantics step for step.

The reference wraps torch.optim (``train/optimizer.py:5``); in torch,
Adam's ``weight_decay`` is *coupled* L2 (added to the gradient before
moment updates) while AdamW's is decoupled.  These tests run several
updates with fixed synthetic gradients through the repo optimizers and
torch and require matching trajectories.
"""
import numpy as np
import pytest

import jax.numpy as jnp

import padertorch_tpu as pt

torch = pytest.importorskip('torch')


def _run_repo(optimizer, params0, grads, n_steps):
    params = [jnp.asarray(p) for p in params0]
    optimizer.set_parameters(params)
    for i in range(n_steps):
        g = [jnp.asarray(gr) * (0.5 ** i) for gr in grads]
        params, _ = optimizer.apply(params, g)
    return [np.asarray(p) for p in params]


def _run_torch(make_torch_opt, params0, grads, n_steps):
    tparams = [torch.nn.Parameter(torch.tensor(p)) for p in params0]
    opt = make_torch_opt(tparams)
    for i in range(n_steps):
        for p, g in zip(tparams, grads):
            p.grad = torch.tensor(g * (0.5 ** i))
        opt.step()
    return [p.detach().numpy() for p in tparams]


@pytest.fixture
def problem():
    rng = np.random.RandomState(0)
    params0 = [rng.randn(4, 3).astype('float32'),
               rng.randn(5).astype('float32')]
    grads = [rng.randn(4, 3).astype('float32'),
             rng.randn(5).astype('float32')]
    return params0, grads


@pytest.mark.parametrize('weight_decay', [0.0, 0.1])
@pytest.mark.parametrize('amsgrad', [False, True])
def test_adam_matches_torch(problem, weight_decay, amsgrad):
    params0, grads = problem
    ours = _run_repo(
        pt.Adam(gradient_clipping=1e10, lr=1e-2,
                weight_decay=weight_decay, amsgrad=amsgrad),
        params0, grads, n_steps=5)
    theirs = _run_torch(
        lambda ps: torch.optim.Adam(
            ps, lr=1e-2, weight_decay=weight_decay, amsgrad=amsgrad),
        params0, grads, n_steps=5)
    for a, b in zip(ours, theirs):
        np.testing.assert_allclose(a, b, atol=1e-5)


@pytest.mark.parametrize('amsgrad', [False, True])
def test_adamw_matches_torch(problem, amsgrad):
    params0, grads = problem
    from padertorch_tpu.train.optimizer import AdamW
    ours = _run_repo(
        AdamW(gradient_clipping=1e10, lr=1e-2, weight_decay=0.05,
              amsgrad=amsgrad),
        params0, grads, n_steps=5)
    theirs = _run_torch(
        lambda ps: torch.optim.AdamW(
            ps, lr=1e-2, weight_decay=0.05, amsgrad=amsgrad),
        params0, grads, n_steps=5)
    for a, b in zip(ours, theirs):
        np.testing.assert_allclose(a, b, atol=1e-5)


def test_sgd_weight_decay_matches_torch(problem):
    params0, grads = problem
    ours = _run_repo(
        pt.SGD(gradient_clipping=1e10, lr=1e-2, momentum=0.9,
               weight_decay=0.1),
        params0, grads, n_steps=5)
    theirs = _run_torch(
        lambda ps: torch.optim.SGD(
            ps, lr=1e-2, momentum=0.9, weight_decay=0.1),
        params0, grads, n_steps=5)
    for a, b in zip(ours, theirs):
        np.testing.assert_allclose(a, b, atol=1e-5)
