"""Trainer integration tests, modeled on the reference's
``tests/test_train/test_trainer.py``: real training of a small model on the
synthetic MNIST fixture, checkpoint-layout contract, resume, virtual
minibatch, and the test_run burn test."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import padertorch_tpu as pt
from padertorch_tpu import nn
from padertorch_tpu import random as ptrandom
from padertorch_tpu.data import collate_fn
from padertorch_tpu.data import dataset as lazy
from padertorch_tpu.testing import MnistDatabase
from padertorch_tpu.train.trainer import Trainer


class MnistModel(pt.Model):
    @classmethod
    def finalize_dogmatic_config(cls, config):
        config['net'] = {
            'factory': nn.Linear,
            'in_features': 28 * 28,
            'out_features': 10,
        }

    def __init__(self, net=None, dropout=0.0):
        if net is None:
            net = nn.Linear(28 * 28, 10)
        self.net = net
        self.drop = nn.Dropout(dropout) if dropout else None

    def forward(self, inputs):
        image = inputs['image']
        x = jnp.reshape(image, (image.shape[0], -1))
        if self.drop is not None:
            x = self.drop(x)
        return self.net(x)

    def review(self, inputs, outputs):
        digits = inputs['digit']
        logp = jax.nn.log_softmax(outputs)
        loss = -jnp.mean(
            jnp.take_along_axis(logp, digits[:, None], axis=1))
        acc = jnp.mean((jnp.argmax(outputs, -1) == digits).astype('float32'))
        return {'loss': loss, 'scalars': {'accuracy': acc}}


def get_datasets(batch_size=8):
    db = MnistDatabase(num_train=32, num_test=2 * batch_size)

    def prepare(batch):
        batch = collate_fn(batch)
        return {
            'image': np.stack(batch['image']).astype('float32'),
            'digit': np.array(batch['digit'], dtype='int32'),
        }

    tr = db.get_dataset('train').batch(batch_size).map(prepare)
    dt = db.get_dataset('test').batch(batch_size).map(prepare)
    return tr, dt


def make_trainer(tmp_path, virtual_minibatch_size=1, **kwargs):
    ptrandom.seed(0)
    model = MnistModel()
    return Trainer(
        model=model,
        storage_dir=tmp_path,
        optimizer=pt.Adam(lr=1e-2),
        stop_trigger=(2, 'epoch'),
        summary_trigger=(1, 'epoch'),
        checkpoint_trigger=(1, 'epoch'),
        virtual_minibatch_size=virtual_minibatch_size,
        **kwargs,
    )


def test_test_run(tmp_path):
    trainer = make_trainer(tmp_path / 'exp')
    tr, dt = get_datasets()
    trainer.test_run(tr, dt)


def test_test_run_with_known_length(tmp_path):
    trainer = make_trainer(tmp_path / 'exp')
    tr, dt = get_datasets()
    trainer.test_run(tr, dt, test_with_known_iterator_length=True)


def test_test_run_virtual_minibatch(tmp_path):
    trainer = make_trainer(tmp_path / 'exp', virtual_minibatch_size=2)
    tr, dt = get_datasets(batch_size=4)
    trainer.test_run(tr, dt)


def test_test_run_detects_zero_grad(tmp_path):
    class ZeroGradModel(MnistModel):
        def review(self, inputs, outputs):
            # loss independent of parameters -> must fail the burn test
            return {'loss': jnp.mean(inputs['image']) * 0.0 + 1.0}

    ptrandom.seed(0)
    trainer = Trainer(
        model=ZeroGradModel(),
        storage_dir=tmp_path / 'exp',
        optimizer=pt.Adam(),
    )
    tr, dt = get_datasets()
    with pytest.raises(AssertionError):
        trainer.test_run(tr, dt)


def test_training_and_checkpoint_layout(tmp_path):
    storage = tmp_path / 'exp'
    trainer = make_trainer(storage)
    tr, dt = get_datasets()
    trainer.register_validation_hook(dt, max_checkpoints=2)
    trainer.train(tr)

    ckpt_dir = storage / 'checkpoints'
    names = {p.name for p in ckpt_dir.iterdir()}
    assert 'ckpt_latest.ptt' in names
    assert 'ckpt_best_loss.ptt' in names
    assert (ckpt_dir / 'ckpt_latest.ptt').is_symlink()
    # 2 epochs x 4 batches = 8 iterations; ckpts at it 0, 4, 8 (max 2 kept
    # + final)
    tfevents = [p for p in storage.iterdir() if 'tfevents' in p.name]
    assert len(tfevents) == 1

    # training actually learned something: loss decreased
    it_ckpts = sorted(
        int(p.name[len('ckpt_'):-len('.ptt')])
        for p in ckpt_dir.iterdir()
        if p.name.startswith('ckpt_') and p.name[len('ckpt_')].isdigit()
    )
    assert it_ckpts[-1] == 8, it_ckpts


def test_resume(tmp_path):
    storage = tmp_path / 'exp'
    trainer = make_trainer(storage)
    tr, dt = get_datasets()
    trainer.train(tr)
    assert trainer.iteration == 8

    # continue for 2 more epochs
    trainer2 = make_trainer(storage)
    trainer2.hooks[-1].trigger.period = 4  # extend stop trigger to 4 epochs
    trainer2.train(tr, resume=True)
    assert trainer2.iteration == 16
    assert trainer2.epoch == 4


def test_multiple_losses_with_weights(tmp_path):
    class TwoLossModel(MnistModel):
        def review(self, inputs, outputs):
            digits = inputs['digit']
            logp = jax.nn.log_softmax(outputs)
            ce = -jnp.mean(jnp.take_along_axis(logp, digits[:, None], 1))
            l2 = jnp.mean(outputs ** 2)
            return {'losses': {'ce': ce, 'l2': l2}}

    ptrandom.seed(0)
    trainer = Trainer(
        model=TwoLossModel(),
        storage_dir=tmp_path / 'exp',
        optimizer=pt.Adam(lr=1e-2),
        loss_weights={'ce': 1.0, 'l2': 0.01},
        stop_trigger=(1, 'epoch'),
    )
    tr, dt = get_datasets()
    trainer.train(tr)
    assert trainer.iteration == 4


def test_multiple_losses_without_weights_raises(tmp_path):
    class TwoLossModel(MnistModel):
        def review(self, inputs, outputs):
            return {'losses': {
                'a': jnp.mean(outputs ** 2),
                'b': jnp.mean(jnp.abs(outputs)),
            }}

    ptrandom.seed(0)
    trainer = Trainer(
        model=TwoLossModel(),
        storage_dir=tmp_path / 'exp',
        optimizer=pt.Adam(),
        stop_trigger=(1, 'epoch'),
    )
    tr, dt = get_datasets()
    with pytest.raises(Exception, match='loss_weights'):
        trainer.train(tr)


def test_dict_of_optimizers(tmp_path):
    class TwoPartModel(pt.Model):
        def __init__(self):
            self.enc = nn.Linear(28 * 28, 16)
            self.dec = nn.Linear(16, 10)

        def forward(self, inputs):
            x = jnp.reshape(
                inputs['image'], (inputs['image'].shape[0], -1))
            return self.dec(jax.nn.relu(self.enc(x)))

        def review(self, inputs, outputs):
            logp = jax.nn.log_softmax(outputs)
            loss = -jnp.mean(
                jnp.take_along_axis(logp, inputs['digit'][:, None], 1))
            return {'loss': loss}

    ptrandom.seed(0)
    trainer = Trainer(
        model=TwoPartModel(),
        storage_dir=tmp_path / 'exp',
        optimizer={'enc': pt.Adam(lr=1e-3), 'dec': pt.SGD(lr=1e-2)},
        stop_trigger=(1, 'epoch'),
    )
    tr, dt = get_datasets()
    trainer.train(tr)
    assert trainer.iteration == 4


def test_non_finite_loss_raises(tmp_path):
    class NanModel(MnistModel):
        def review(self, inputs, outputs):
            return {'loss': jnp.mean(outputs) * jnp.nan}

    ptrandom.seed(0)
    trainer = Trainer(
        model=NanModel(),
        storage_dir=tmp_path / 'exp',
        optimizer=pt.Adam(),
        stop_trigger=(1, 'epoch'),
    )
    tr, dt = get_datasets()
    with pytest.raises(RuntimeError, match='not finite'):
        trainer.train(tr)
    # error state dumped for debugging
    assert list((tmp_path / 'exp' / 'log').glob('error_state_*'))


def test_trainer_from_config(tmp_path):
    config = Trainer.get_config({
        'model': {'factory': MnistModel},
        'storage_dir': str(tmp_path / 'exp'),
        'stop_trigger': (2, 'epoch'),
    })
    assert config['optimizer']['factory'].endswith('Adam')
    ptrandom.seed(0)
    trainer = Trainer.from_config(config)
    tr, dt = get_datasets()
    trainer.test_run(tr, dt)


def test_tfevents_written_and_readable(tmp_path):
    storage = tmp_path / 'exp'
    trainer = make_trainer(storage)
    tr, dt = get_datasets()
    trainer.register_validation_hook(dt)
    trainer.train(tr)
    from padertorch_tpu.summary.tfevents import load_events_as_dict
    tfevents = [p for p in storage.iterdir() if 'tfevents' in p.name]
    events = load_events_as_dict(tfevents[0])
    tags = {
        v['summary']['value'][0]['tag']
        for v in events if 'summary' in v
    }
    assert 'training/loss' in tags, tags
    assert 'validation/loss' in tags, tags
    assert 'training/grad_norm' in tags, tags
    assert 'training/accuracy' in tags, tags


def test_recompilation_budget(tmp_path):
    """With fixed shapes, the step compiles only a handful of programs."""
    trainer = make_trainer(tmp_path / 'exp')
    tr, dt = get_datasets()
    trainer.register_validation_hook(dt)
    trainer.train(tr)
    traces = trainer.num_traces
    # one train program (+1 for the snapshot-flag flip) and one val
    # program (+1 snapshot variant)
    assert traces.get('train', 0) <= 3, traces
    assert traces.get('val', 0) <= 3, traces


def test_no_array_leak_across_steps(tmp_path):
    """Memory hygiene (reference test_trainer.py:565): training must not
    accumulate live device arrays across iterations."""
    import gc
    trainer = make_trainer(tmp_path / 'exp')
    tr, dt = get_datasets()
    trainer.train(tr)
    gc.collect()
    n_after_first = len(jax.live_arrays())

    trainer2 = make_trainer(tmp_path / 'exp2')
    trainer2.hooks[-1].trigger.period = 4  # 4 epochs
    trainer2.train(tr)
    gc.collect()
    n_after_second = len(jax.live_arrays())
    # 2x the epochs must not mean more live arrays (+small slack)
    assert n_after_second < n_after_first + 50, (
        n_after_first, n_after_second)


def test_orbax_checkpoint_format(tmp_path):
    """Full training + resume with checkpoint_format='orbax' (sharded
    production checkpoints): same directory contract, ranking,
    symlinks, and max_checkpoints trimming of directories."""
    storage = tmp_path / 'exp'

    def make(storage):
        ptrandom.seed(0)
        return Trainer(
            model=MnistModel(), storage_dir=storage,
            optimizer=pt.Adam(lr=1e-2), stop_trigger=(2, 'epoch'),
            summary_trigger=(1, 'epoch'),
            checkpoint_trigger=(1, 'epoch'),
            checkpoint_format='orbax')

    trainer = make(storage)
    tr, dt = get_datasets()
    trainer.register_validation_hook(dt, max_checkpoints=2)
    trainer.train(tr)

    ckpt_dir = storage / 'checkpoints'
    names = {p.name for p in ckpt_dir.iterdir()}
    assert 'ckpt_latest.orbax' in names, names
    assert 'ckpt_best_loss.orbax' in names, names
    assert (ckpt_dir / 'ckpt_latest.orbax').is_symlink()
    assert (ckpt_dir / 'ckpt_8.orbax').is_dir()

    # resume from the orbax checkpoint (hook state incl. ranking
    # restores into the re-registered validation hook)
    trainer2 = make(storage)
    trainer2.register_validation_hook(dt, max_checkpoints=2)
    from padertorch_tpu.train.hooks import StopTrainingHook
    stop = [h for h in trainer2.hooks
            if isinstance(h, StopTrainingHook)][0]
    stop.trigger.period = 4
    trainer2.train(tr, resume=True)
    assert trainer2.iteration == 16
