"""Hook unit/integration tests modeled on the reference's
``tests/test_train/test_hooks.py`` and the golden hook-trace idea of
``tests/test_train/test_trainer.py:68-207``."""
import types

import numpy as np
import pytest

import jax.numpy as jnp

import padertorch_tpu as pt
from padertorch_tpu.train import hooks as hooks_mod
from padertorch_tpu.train.hooks import (
    SummaryHook, BackOffValidationHook, LRSchedulerHook, AnnealingHook,
    LRAnnealingHook, StopTrainingHook, StopTraining,
)
from padertorch_tpu.train.trigger import IntervalTrigger


class TriggerMock:
    """Wraps a trigger and logs every query (reference test_trainer.py:68)."""

    def __init__(self, trigger, log, name):
        self.trigger = trigger
        self.log = log
        self.name = name

    def __call__(self, iteration, epoch):
        result = self.trigger(iteration, epoch)
        self.log.append(
            f'I:{iteration}, E: {epoch}, {result} [{self.name}]')
        return result

    def set_last(self, iteration, epoch):
        self.trigger.set_last(iteration, epoch)

    @property
    def last(self):
        return self.trigger.last


def test_golden_hook_trace(tmp_path):
    """Exact trigger-firing sequence over 2 epochs x 2 iterations."""
    from tests.test_train.test_trainer import MnistModel, get_datasets
    from padertorch_tpu import random as ptrandom
    from padertorch_tpu.train.trainer import Trainer

    ptrandom.seed(0)
    trainer = Trainer(
        model=MnistModel(),
        storage_dir=tmp_path / 'exp',
        optimizer=pt.Adam(lr=1e-2),
        stop_trigger=(2, 'epoch'),
        summary_trigger=(1, 'epoch'),
        checkpoint_trigger=(1, 'epoch'),
    )
    log = []
    for hook in trainer.hooks:
        hook.trigger = TriggerMock(
            hook.trigger, log, type(hook).__name__)
    tr, dt = get_datasets(batch_size=16)  # 2 batches per epoch
    trainer.train(tr)

    golden = [
        # epoch 0 start: all hooks queried at (0, 0)
        'I:0, E: 0, True [SummaryHook]',
        'I:0, E: 0, True [CheckpointHook]',
        'I:0, E: 0, False [StopTrainingHook]',
        # mid-epoch pre_step at iteration 1 (same epoch: no re-fire)
        'I:1, E: 0, False [SummaryHook]',
        'I:1, E: 0, False [CheckpointHook]',
        'I:1, E: 0, False [StopTrainingHook]',
        # epoch 1 start
        'I:2, E: 1, True [SummaryHook]',
        'I:2, E: 1, True [CheckpointHook]',
        'I:2, E: 1, False [StopTrainingHook]',
        'I:3, E: 1, False [SummaryHook]',
        'I:3, E: 1, False [CheckpointHook]',
        'I:3, E: 1, False [StopTrainingHook]',
        # epoch 2 start: stop fires
        'I:4, E: 2, True [SummaryHook]',
        'I:4, E: 2, True [CheckpointHook]',
        'I:4, E: 2, True [StopTrainingHook]',
    ]
    assert log == golden, '\n'.join(log)


def fake_trainer(iteration=0, epoch=0):
    """Minimal namespace standing in for a Trainer (reference style)."""
    import padertorch_tpu.train.trainer as trainer_mod
    ns = types.SimpleNamespace()
    ns.iteration = iteration
    ns.epoch = epoch
    ns.model = types.SimpleNamespace(
        create_snapshot=False,
        modify_summary=lambda s: pt.Model.modify_summary(ns.model, s),
    )
    ns.train_timer = trainer_mod.ContextTimerDict()
    ns.validate_timer = trainer_mod.ContextTimerDict()
    return ns


def test_summary_hook_aggregation():
    hook = SummaryHook((1, 'epoch'))
    trainer = fake_trainer()
    for v in [1.0, 2.0, 3.0]:
        hook.post_step(trainer, None, None,
                       {'scalars': {'loss': jnp.asarray(v)}})
    hook.finalize_summary(trainer)
    assert hook.summary['scalars']['loss'] == pytest.approx(2.0)


def test_summary_hook_duplicate_tag_raises():
    hook = SummaryHook((1, 'epoch'))
    trainer = fake_trainer()
    hook.post_step(trainer, None, None, {
        'scalars': {'grad_norm': jnp.asarray(1.0)},
        'histograms': {'grad_norm': jnp.asarray([1.0])},
    })
    hook.finalize_summary(trainer)

    class Writer:
        def add_scalar(self, *a, **k):
            pass

        def add_histogram(self, *a, **k):
            pass

    trainer.writer = Writer()
    with pytest.raises(AssertionError, match='used multiple times'):
        hook.dump_summary(trainer)


def test_summary_hook_rejects_unknown_keys():
    hook = SummaryHook((1, 'epoch'))
    with pytest.raises(AssertionError):
        hook.update_summary({'bogus': {}})


def test_annealing_hook_piecewise_linear():
    values = []

    class TestAnnealing(AnnealingHook):
        def get_value(self, trainer):
            return 2.0

        def set_value(self, trainer, value):
            values.append(value)

    hook = TestAnnealing(
        (1, 'iteration'), breakpoints=[(2, 1.0), (4, 0.5)],
        unit='iteration', name='x')
    for it in range(6):
        trainer = fake_trainer(iteration=it)
        hook.pre_step(trainer)
    # relative to initial value 2.0: 1.0 until x=2, then linear to 0.5 at 4
    assert values[0] == pytest.approx(2.0)
    assert values[2] == pytest.approx(2.0)
    assert values[3] == pytest.approx(1.5)   # halfway 1.0 -> 0.5, x2
    assert values[4] == pytest.approx(1.0)
    assert values[5] == pytest.approx(1.0)   # constant after last break


def test_lr_annealing_and_scheduler(tmp_path):
    from padertorch_tpu import random as ptrandom
    from padertorch_tpu import nn
    ptrandom.seed(0)
    opt = pt.Adam(lr=1.0)
    opt.set_parameters({'w': jnp.ones(2)})
    trainer = fake_trainer()
    trainer.optimizer = opt

    hook = LRAnnealingHook(
        (1, 'iteration'), breakpoints=[(0, 1.0), (10, 0.1)],
        unit='iteration')
    trainer.iteration = 5
    hook.pre_step(trainer)
    assert opt.lr == pytest.approx(0.55)

    sched = LRSchedulerHook(
        lambda count: 0.5 ** count, trigger=(1, 'epoch'))
    trainer2 = fake_trainer(iteration=1, epoch=1)
    trainer2.optimizer = opt
    sched.pre_step(trainer2)
    assert opt.lr == pytest.approx(0.5)
    # resume bookkeeping
    sched2 = LRSchedulerHook(
        lambda count: 0.5 ** count, trigger=(1, 'epoch'))
    sched2.set_last(10, 3)
    assert sched2._count == 3


def test_backoff_restores_best_and_decays_lr(tmp_path):
    """BackOff reloads the best checkpoint and multiplies the lr."""
    from tests.test_train.test_trainer import MnistModel, get_datasets
    from padertorch_tpu import random as ptrandom
    from padertorch_tpu.train.trainer import Trainer

    ptrandom.seed(0)
    trainer = Trainer(
        model=MnistModel(),
        storage_dir=tmp_path / 'exp',
        optimizer=pt.Adam(lr=1e-2),
        stop_trigger=(4, 'epoch'),
    )
    tr, dt = get_datasets()
    # back off on the first degradation (reference tests use n_back_off=1)
    trainer.register_validation_hook(
        dt, n_back_off=1, back_off_patience=0, lr_update_factor=0.5)
    trainer.train(tr)
    # training ran to the end; lr either decayed through backoff or stayed
    assert trainer.optimizer.lr in (
        pytest.approx(1e-2), pytest.approx(5e-3))
    assert trainer.iteration == 16


def test_stop_training_hook():
    hook = StopTrainingHook((1, 'epoch'))
    trainer = fake_trainer(iteration=10, epoch=1)
    with pytest.raises(StopTraining):
        hook.pre_step(trainer)


def test_energy_estimate_hook():
    from padertorch_tpu.train.hooks import EnergyEstimateHook

    class Writer:
        def __init__(self):
            self.scalars = {}

        def add_scalar(self, tag, value, step):
            self.scalars[tag] = (value, step)

    trainer = fake_trainer()
    trainer.writer = Writer()
    hook = EnergyEstimateHook((1, 'epoch'), chip_watts=200.0,
                              host_watts=100.0)
    hook.pre_step(trainer)  # starts the clock + fires at epoch 0
    assert 'x_emissions/energy_kwh' in trainer.writer.scalars
    assert trainer.writer.scalars['x_emissions/avg_power_watts'][0] == 300.0
    energy0 = trainer.writer.scalars['x_emissions/energy_kwh'][0]
    # resume roundtrip carries consumed energy
    state = hook.state_dict()
    hook2 = EnergyEstimateHook((1, 'epoch'))
    hook2.load_state_dict(state)
    assert hook2._consumed_kwh() >= energy0
    trainer.iteration = 10
    hook.close(trainer)
    energy1 = trainer.writer.scalars['x_emissions/energy_kwh'][0]
    assert energy1 >= energy0
    assert trainer.writer.scalars['x_emissions/co2_kg'][0] == (
        pytest.approx(energy1 * 0.475))


def test_ranking_never_deletes_latest_checkpoint(tmp_path):
    """Pruning must not delete the checkpoint ckpt_latest points to —
    a crash between pruning and the next save would otherwise leave no
    resumable state (regression: dangling ckpt_latest symlink)."""
    from padertorch_tpu.train.hooks import ValidationHook, CKPT_EXT

    ckpt_dir = tmp_path / 'checkpoints'
    ckpt_dir.mkdir()
    hook = ValidationHook((1, 'epoch'), iterator=[], metric='loss',
                          max_checkpoints=1)
    # ckpt_10 is best; ckpt_20 is the current latest (worse score);
    # ckpt_30 is being written right now
    for name in ('ckpt_10', 'ckpt_20'):
        (ckpt_dir / f'{name}{CKPT_EXT}').write_bytes(b'x')
    (ckpt_dir / f'ckpt_latest{CKPT_EXT}').symlink_to(
        f'ckpt_20{CKPT_EXT}')
    hook.ckpt_ranking = [(f'ckpt_10{CKPT_EXT}', 0.1),
                         (f'ckpt_20{CKPT_EXT}', 0.9)]
    hook._rank_checkpoint(ckpt_dir, f'ckpt_30{CKPT_EXT}', 0.5)
    # latest's target survives; it stays in the ranking for later pruning
    assert (ckpt_dir / f'ckpt_20{CKPT_EXT}').exists()
    names = [name for name, _ in hook.ckpt_ranking]
    assert f'ckpt_20{CKPT_EXT}' in names
    assert f'ckpt_10{CKPT_EXT}' in names  # the best one


def test_load_checkpoint_falls_back_on_dangling_latest(tmp_path):
    import jax.numpy as jnp
    import padertorch_tpu as pt
    from padertorch_tpu import nn
    from padertorch_tpu.train.trainer import Trainer

    class M(pt.Model):
        def __init__(self):
            self.lin = nn.Linear(2, 1)

        def forward(self, b):
            return self.lin(b['x'])

        def review(self, b, o):
            return {'loss': jnp.mean(o ** 2)}

    trainer = Trainer(model=M(), storage_dir=tmp_path,
                      optimizer=pt.Adam(gradient_clipping=1e10))
    trainer.iteration, trainer.epoch = 7, 1
    trainer.save_checkpoint()
    ckpt_dir = trainer.checkpoint_dir
    # simulate the crash window: latest points at a deleted file and a
    # partial write lingers
    latest = ckpt_dir / 'ckpt_latest.ptt'
    latest.unlink()
    latest.symlink_to('ckpt_999.ptt')
    (ckpt_dir / 'ckpt_1000.ptt.tmp123').write_bytes(b'partial')
    trainer.iteration = 0
    trainer.load_checkpoint()
    assert trainer.iteration == 7
    assert not list(ckpt_dir.glob('*.tmp*'))


def test_load_checkpoint_cleans_orbax_tmp_directory(tmp_path):
    """Orbax tmp writes are *directories*; the orphan cleanup must not
    crash on them (Path.unlink raises IsADirectoryError)."""
    import jax.numpy as jnp
    import padertorch_tpu as pt
    from padertorch_tpu import nn
    from padertorch_tpu.train.trainer import Trainer

    class M(pt.Model):
        def __init__(self):
            self.lin = nn.Linear(2, 1)

        def forward(self, b):
            return self.lin(b['x'])

        def review(self, b, o):
            return {'loss': jnp.mean(o ** 2)}

    trainer = Trainer(model=M(), storage_dir=tmp_path,
                      optimizer=pt.Adam(gradient_clipping=1e10),
                      checkpoint_format='orbax')
    trainer.iteration, trainer.epoch = 3, 0
    trainer.save_checkpoint()
    orphan = trainer.checkpoint_dir / 'ckpt_9.orbax.tmp777'
    orphan.mkdir()
    (orphan / 'partial').write_bytes(b'x')
    trainer.iteration = 0
    trainer.load_checkpoint()
    assert trainer.iteration == 3
    assert not orphan.exists()


def test_ranking_protects_latest_for_orbax_ext(tmp_path):
    """The latest-target protection must follow the checkpoint
    extension in use (orbax uses .orbax, not .ptt)."""
    from padertorch_tpu.train.hooks import ValidationHook

    ckpt_dir = tmp_path / 'checkpoints'
    ckpt_dir.mkdir()
    hook = ValidationHook((1, 'epoch'), iterator=[], metric='loss',
                          max_checkpoints=1)
    for name in ('ckpt_10', 'ckpt_20'):
        (ckpt_dir / f'{name}.orbax').mkdir()
    (ckpt_dir / 'ckpt_latest.orbax').symlink_to('ckpt_20.orbax')
    hook.ckpt_ranking = [('ckpt_10.orbax', 0.1), ('ckpt_20.orbax', 0.9)]
    hook._rank_checkpoint(ckpt_dir, 'ckpt_30.orbax', 0.5)
    assert (ckpt_dir / 'ckpt_20.orbax').exists()


def test_loss_weight_annealing_reaches_training(tmp_path):
    """Regression: loss weights were converted to device arrays ONCE
    before the train loop, so LossWeightAnnealingHook silently never
    affected training.  The per-step memoized _loss_weight_arrays must
    pick up runtime mutation."""
    import numpy as np
    import jax.numpy as jnp
    import padertorch_tpu as pt
    from padertorch_tpu import random as ptrandom
    from padertorch_tpu.train.trainer import Trainer
    from padertorch_tpu.train.hooks import Hook

    seen = []

    class TwoLoss(pt.Model):
        def __init__(self):
            self.net = pt.nn.Linear(4, 1)

        def forward(self, inputs):
            return self.net(inputs['x'])

        def review(self, inputs, outputs):
            return {'losses': {
                'a': jnp.mean(outputs ** 2),
                'b': jnp.mean(jnp.abs(outputs)),
            }}

    class Bump(Hook):
        """Mutate trainer.loss_weights mid-training (what
        LossWeightAnnealingHook.set_value does)."""

        def pre_step(self, trainer):
            trainer.loss_weights['b'] = float(trainer.iteration)

        def post_step(self, trainer, example, model_out, review):
            # the step's total weighted loss must reflect THIS step's
            # weights — capture what the jitted step actually used
            seen.append((trainer.iteration,
                         float(np.asarray(trainer._prev_loss))))

    rng = np.random.RandomState(0)
    exs = [{'x': rng.randn(2, 4).astype('float32')} for _ in range(3)]
    ptrandom.seed(0)
    tr = Trainer(model=TwoLoss(), storage_dir=tmp_path,
                 optimizer=pt.Adam(lr=0.0),   # freeze params
                 loss_weights={'a': 1.0, 'b': 0.0},
                 stop_trigger=(1, 'epoch'))
    tr.register_hook(Bump())
    tr.train(exs)
    # lr=0 -> outputs identical each step; loss must still GROW with
    # the annealed weight b = iteration
    losses = dict(seen)
    assert losses[2] > losses[1] > losses[0], losses


def test_resume_with_track_emissions(tmp_path):
    """Regression: resuming a run that used track_emissions=True
    crashed — load_checkpoint ran before the EnergyEstimateHook was
    registered, so its checkpointed state tripped the unconsumed-
    hook-state assert."""
    import padertorch_tpu as pt
    from padertorch_tpu import random as ptrandom
    from padertorch_tpu.train.trainer import Trainer
    from .test_trainer import MnistModel, get_datasets

    tr_ds, _ = get_datasets()

    def trainer(epochs):
        ptrandom.seed(0)
        return Trainer(model=MnistModel(), storage_dir=tmp_path,
                       optimizer=pt.Adam(lr=1e-2),
                       stop_trigger=(epochs, 'epoch'))

    trainer(1).train(tr_ds, track_emissions=True)
    t2 = trainer(2)
    t2.train(tr_ds, resume=True, track_emissions=True)
    assert t2.epoch == 2


def test_adafactor_lr_none_trains(tmp_path):
    """Regression: Adafactor(lr=None) (the relative-step-size mode its
    docstring advertises) crashed with KeyError('learning_rate') in
    the optimizer summary — inject_hyperparams injects nothing for
    None."""
    import padertorch_tpu as pt
    from padertorch_tpu import random as ptrandom
    from padertorch_tpu.train.trainer import Trainer
    from .test_trainer import MnistModel, get_datasets

    tr_ds, _ = get_datasets()
    ptrandom.seed(0)
    t = Trainer(model=MnistModel(), storage_dir=tmp_path,
                optimizer=pt.Adafactor(lr=None),
                stop_trigger=(1, 'epoch'))
    t.train(tr_ds)
    assert t.optimizer.lr is None
