"""Asynchronous (background-thread) checkpointing: overlapped writes
must be committed, snapshot-consistent (donation-safe), resumable, and
must surface writer errors instead of swallowing them."""
import os

import numpy as np
import pytest

import padertorch_tpu as pt
from padertorch_tpu.serialize import load_state
from tests.test_train.test_trainer import (
    MnistModel, get_datasets, make_trainer,
)


def test_async_training_writes_resumable_checkpoints(tmp_path):
    trainer = make_trainer(tmp_path / 'exp', async_checkpointing=True)
    tr, dt = get_datasets()
    trainer.register_validation_hook(dt)
    trainer.train(tr)
    assert trainer._ckpt_writer is None  # committed before returning

    ckpt_dir = trainer.checkpoint_dir
    names = sorted(os.listdir(ckpt_dir))
    assert 'ckpt_latest.ptt' in names, names
    latest = ckpt_dir / 'ckpt_latest.ptt'
    assert latest.is_symlink() and latest.exists()
    assert (ckpt_dir / 'ckpt_ranking.json').exists()

    # resume restores the saved iteration
    resumed = make_trainer(tmp_path / 'exp', async_checkpointing=True)
    resumed.register_validation_hook(dt)
    resumed.load_checkpoint()
    assert resumed.iteration == trainer.iteration


def test_async_save_equals_sync_save(tmp_path):
    trainer = make_trainer(tmp_path / 'exp')
    tr, dt = get_datasets()
    trainer.train(tr)

    sync_path = tmp_path / 'sync.ptt'
    async_path = tmp_path / 'async.ptt'
    trainer.save_checkpoint(sync_path)
    trainer.async_checkpointing = True
    trainer.save_checkpoint(async_path)
    trainer.wait_for_checkpoint_writes()

    a, b = load_state(sync_path), load_state(async_path)
    flat_a = pt.utils.nested.flatten(a)
    flat_b = pt.utils.nested.flatten(b)
    assert flat_a.keys() == flat_b.keys()
    for key, value in flat_a.items():
        if isinstance(value, np.ndarray):
            np.testing.assert_array_equal(value, flat_b[key], err_msg=key)
        else:
            assert value == flat_b[key], key


def test_async_save_snapshots_to_host_before_returning(tmp_path):
    """The writer thread must never see live device arrays: the next
    jitted step donates parameter/optimizer buffers, so the state
    handed to the writer has to be a host (numpy) snapshot."""
    import jax
    trainer = make_trainer(tmp_path / 'exp', async_checkpointing=True)
    tr, dt = get_datasets()
    trainer.train(tr)

    captured = {}
    original = type(trainer)._write_checkpoint

    def spy(self, state, path, iteration):
        captured['leaves'] = jax.tree_util.tree_leaves(state)
        captured['iteration'] = iteration
        return original(self, state, path, iteration)

    type(trainer)._write_checkpoint = spy
    try:
        trainer.save_checkpoint(tmp_path / 'snap.ptt')
        trainer.wait_for_checkpoint_writes()
    finally:
        type(trainer)._write_checkpoint = original

    assert captured['iteration'] == trainer.iteration
    assert not any(isinstance(leaf, jax.Array)
                   for leaf in captured['leaves'])
    state = load_state(tmp_path / 'snap.ptt')
    assert int(state['iteration']) == trainer.iteration


def test_writer_errors_surface_on_wait(tmp_path, monkeypatch):
    trainer = make_trainer(tmp_path / 'exp', async_checkpointing=True)
    tr, dt = get_datasets()
    trainer.train(tr)

    def boom(state, path):
        raise OSError('disk full')

    import padertorch_tpu.train.trainer as trainer_mod
    monkeypatch.setattr(trainer_mod, 'dump_state', boom)
    trainer.save_checkpoint(tmp_path / 'fail.ptt')
    with pytest.raises(RuntimeError, match='checkpoint write failed'):
        trainer.wait_for_checkpoint_writes()
    # the error is raised exactly once, then cleared
    trainer.wait_for_checkpoint_writes()
