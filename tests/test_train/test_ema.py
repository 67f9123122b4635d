"""EMA parameter averaging hook (``train/hooks.py:EMAHook``)."""
import numpy as np
import jax
import jax.numpy as jnp

import padertorch_tpu as pt
from padertorch_tpu import random as ptrandom
from padertorch_tpu.module import partition
from padertorch_tpu.train.hooks import EMAHook

from .test_trainer import MnistModel, get_datasets, make_trainer


def test_ema_tracks_manual_average(tmp_path):
    tr, _ = get_datasets()
    trainer = make_trainer(tmp_path)
    ema = EMAHook(decay=0.5)
    trainer.register_hook(ema)

    # manual replication: record params after each optimize
    seen = []
    orig = ema.post_optimize

    def spy(trainer_, summary):
        orig(trainer_, summary)
        p, _ = partition(trainer_.model)
        seen.append([np.asarray(l)
                     for l in jax.tree_util.tree_leaves(p)])
    ema.post_optimize = spy

    trainer.train(tr)
    assert ema.ema_params is not None and len(seen) >= 2

    expect = [np.array(l) for l in seen[0]]
    for step in seen[1:]:
        expect = [0.5 * e + 0.5 * p for e, p in zip(expect, step)]
    got = [np.asarray(l)
           for l in jax.tree_util.tree_leaves(ema.ema_params)]
    for e, g in zip(expect, got):
        np.testing.assert_allclose(g, e, rtol=1e-5, atol=1e-6)


def test_ema_swap_restores(tmp_path):
    tr, _ = get_datasets()
    trainer = make_trainer(tmp_path)
    ema = EMAHook(decay=0.9)
    trainer.register_hook(ema)
    trainer.train(tr)

    before = [np.asarray(l) for l in
              jax.tree_util.tree_leaves(partition(trainer.model)[0])]
    with ema.average_parameters(trainer.model):
        inside = [np.asarray(l) for l in
                  jax.tree_util.tree_leaves(partition(trainer.model)[0])]
        ema_leaves = [np.asarray(l) for l in
                      jax.tree_util.tree_leaves(ema.ema_params)]
        for i, e in zip(inside, ema_leaves):
            np.testing.assert_array_equal(i, e)
        # EMA differs from the live params (training moved them)
        assert any(np.abs(i - b).max() > 1e-6
                   for i, b in zip(inside, before))
    after = [np.asarray(l) for l in
             jax.tree_util.tree_leaves(partition(trainer.model)[0])]
    for a, b in zip(after, before):
        np.testing.assert_array_equal(a, b)


def test_ema_state_survives_resume(tmp_path):
    tr, _ = get_datasets()
    trainer = make_trainer(tmp_path)
    ema = EMAHook(decay=0.7)
    trainer.register_hook(ema)
    trainer.train(tr)
    want = [np.asarray(l) for l in
            jax.tree_util.tree_leaves(ema.ema_params)]

    ptrandom.seed(0)
    trainer2 = make_trainer(tmp_path)
    ema2 = EMAHook(decay=0.999)  # decay comes from the checkpoint
    trainer2.register_hook(ema2)
    trainer2.load_checkpoint()
    # restore is deferred to the first pre_step (model must exist)
    ema2.pre_step(trainer2)
    assert ema2.decay == 0.7
    got = [np.asarray(l) for l in
           jax.tree_util.tree_leaves(ema2.ema_params)]
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)
