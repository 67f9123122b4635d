"""Hooks: all non-core training-loop behavior.

Reference parity: ``padertorch/train/hooks.py`` — same priorities, lifecycle
(``pre_step``/``post_step``/``post_optimize``/``close``/``set_last``/
``state_dict``), summary aggregation semantics, checkpoint ranking, backoff
and early stopping.

TPU-native twist: review values arriving in ``post_step`` are *device
arrays* from the jitted step.  They are accumulated as-is (no host sync!)
and only fetched to numpy when a summary is finalized — by then the async
dispatch queue has long drained, so the fetch is free.
"""
import re
import types
from collections import defaultdict
from contextlib import contextmanager
from enum import IntEnum
from pathlib import Path

import numpy as np
import jax.numpy as jnp

from padertorch_tpu.train.trigger import IntervalTrigger, EndTrigger

__all__ = [
    'Priority',
    'Hook',
    'TriggeredHook',
    'SummaryHook',
    'CheckpointHook',
    'ValidationHook',
    'BackOffValidationHook',
    'LRSchedulerHook',
    'ProgressBarHook',
    'JaxProfilerHook',
    'EnergyEstimateHook',
    'EmissionsTrackerHook',
    'StopTrainingHook',
    'StopTraining',
    'AnnealingHook',
    'LossWeightAnnealingHook',
    'ModelAttributeAnnealingHook',
    'LRAnnealingHook',
]

CKPT_EXT = '.ptt'


def _natkey(name):
    """Natural sort key: 'ckpt_10' sorts after 'ckpt_2'."""
    return tuple(
        int(part) if part.isdigit() else part
        for part in re.split(r'(\d+)', str(name))
    )


class Priority(IntEnum):
    """Hook dispatch order (higher runs first). Reference: ``hooks.py:43``."""
    END = 10
    CHECKPOINT = 11  # after other hooks, so latest hook states get saved
    DEFAULT = 15
    VALIDATION = 20
    PROGRESS = 30
    PRINT = 40
    SUMMARY = 50


class Hook:
    @property
    def priority(self):
        return Priority.DEFAULT

    @property
    def uid(self):
        """Unique id keying this hook's state in trainer checkpoints."""
        return type(self).__qualname__

    def state_dict(self):
        return None

    def load_state_dict(self, state_dict):
        raise NotImplementedError

    def pre_step(self, trainer):
        """Called before each iteration of the train iterator."""

    def post_step(self, trainer, example, model_output, review):
        """Called after each train step."""

    def post_optimize(self, trainer, summary):
        """Called after each optimizer step with grad-norm/lr summary."""

    def close(self, trainer):
        pass

    def set_last(self, iteration, epoch):
        pass


class TriggeredHook(Hook):
    def __init__(self, trigger=None):
        self.trigger = IntervalTrigger.new(trigger)

    def set_last(self, iteration, epoch):
        self.trigger.set_last(iteration, epoch)


def _remove_checkpoint(path):
    """Remove a checkpoint file (.ptt) or directory (.orbax)."""
    import shutil
    if path.is_dir() and not path.is_symlink():
        shutil.rmtree(path)
    else:
        path.unlink()


def _is_primary():
    """True on the process that owns host-side writes (process 0).

    Multi-controller runs (``jax.distributed``) execute every hook on
    every process so the hook STATE stays in lockstep; only the actual
    file writes (checkpoint pruning, ranking json, symlinks, tfevents)
    are primary-only.  Reference analog: rank-0-gated MPI IO
    (``padertorch/base.py:152-165``).
    """
    from padertorch_tpu.parallel import multihost
    return multihost.is_primary()


def _fetch(value):
    """Device array -> numpy (a no-op for host values)."""
    import jax
    if isinstance(value, jax.Array):
        return np.asarray(jax.device_get(value))
    return value


def _scalars_to_list(scalars):
    scalars = _fetch(scalars)
    if isinstance(scalars, np.ndarray):
        return scalars.flatten().tolist()
    if isinstance(scalars, (list, tuple)):
        return list(scalars)
    assert np.isscalar(scalars), scalars
    return [scalars]


class SummaryHook(TriggeredHook):
    """Aggregates review dicts and writes them to the tfevents file.

    Reference parity: ``hooks.py:153``.  Values are held as device arrays
    until ``finalize_summary`` fetches them in one go.
    """

    create_snapshot = True

    def __init__(self, trigger, summary_prefix='training'):
        super().__init__(trigger)
        self.summary_prefix = summary_prefix
        self.reset_summary()

    @property
    def priority(self):
        return Priority.SUMMARY

    @staticmethod
    def empty_summary_dict():
        # MappingProxyType guards against typo'd keys (like the reference).
        return types.MappingProxyType(dict(
            scalars=defaultdict(list),
            histograms=defaultdict(list),
            audios=dict(),
            images=dict(),
            texts=dict(),
            figures=dict(),
            timings=dict(),
            buffers=defaultdict(list),
            snapshots=dict(),
        ))

    def reset_summary(self):
        self.summary = self.empty_summary_dict()
        self.create_snapshot = True

    def update_summary(self, review):
        allowed_keys = {
            'scalars', 'histograms', 'audios', 'images', 'texts',
            'figures', 'buffers', 'snapshots',
        }
        redundant_keys = set(review.keys()) - allowed_keys
        assert len(redundant_keys) == 0, (
            redundant_keys, review.keys(), allowed_keys)
        assert len(review) >= 1, review
        popped = {**review}
        # scalars/histograms: keep raw (possibly device) values; fetch later
        for key, value in popped.pop('scalars', {}).items():
            self.summary['scalars'][key].append(value)
        for key, value in popped.pop('histograms', {}).items():
            self.summary['histograms'][key].append(value)
            self.summary['histograms'][key] = \
                self.summary['histograms'][key][-1_000_000:]
        for key, value in popped.pop('buffers', {}).items():
            self.summary['buffers'][key].append(value)
        for key, value in popped.pop('snapshots', {}).items():
            self.summary['snapshots'][key] = value  # keep last
        for key, value in popped.pop('audios', {}).items():
            self.summary['audios'][key] = value  # keep last
        for key, value in popped.pop('images', {}).items():
            self.summary['images'][key] = value  # keep last
        for key, value in popped.pop('figures', {}).items():
            self.summary['figures'][key] = value  # keep last
        for key, value in popped.pop('texts', {}).items():
            assert isinstance(value, str), value
            self.summary['texts'][key] = value  # keep last
        assert len(popped) == 0, (popped, review)

    def _materialize_summary(self):
        """Fetch device arrays to host, flatten scalars to float lists."""
        import jax
        summary = dict(self.summary)
        # One bulk transfer for everything that is still on device.
        fetched = jax.device_get({
            'scalars': dict(summary['scalars']),
            'histograms': dict(summary['histograms']),
        })
        summary['scalars'] = defaultdict(list, {
            k: [x for v in vals for x in _scalars_to_list(v)]
            for k, vals in fetched['scalars'].items()
        })
        summary['histograms'] = defaultdict(list, {
            k: [x for v in vals for x in _scalars_to_list(v)]
            for k, vals in fetched['histograms'].items()
        })
        summary['buffers'] = defaultdict(list, {
            k: [_fetch(v) for v in vals]
            for k, vals in summary['buffers'].items()
        })
        summary['snapshots'] = {
            k: _fetch(v) for k, v in summary['snapshots'].items()
        }
        summary['audios'] = {
            k: _fetch_audio(v) for k, v in summary['audios'].items()
        }
        summary['images'] = {
            k: _fetch(v) for k, v in summary['images'].items()
        }
        self.summary = types.MappingProxyType(summary)

    def compute_timings(self, timer):
        timer_dict = timer.as_dict
        summary_timings = {}
        sum_time_per_iteration = np.sum(
            timer_dict.get('time_per_iteration', [0]))
        if sum_time_per_iteration > 0:
            for k in [
                'time_per_data_loading',
                'time_per_to_device',
                'time_per_forward',
                'time_per_review',
                'time_per_backward',
                'time_per_optimize',
            ]:
                if k in timer_dict:
                    summary_timings[k.replace('_per_', '_rel_')] = \
                        np.sum(timer_dict.pop(k)) / sum_time_per_iteration
        summary_timings.update({
            key: timing.mean() for key, timing in timer_dict.items()
        })
        timer.clear()
        return summary_timings

    def finalize_summary(self, trainer):
        assert len(self.summary['timings']) == 0, self.summary['timings']
        self._materialize_summary()
        for key, timing in self.compute_timings(trainer.train_timer).items():
            self.summary['timings'][key] = timing
        self.summary = trainer.model.modify_summary(self.summary)
        assert len(self.summary['buffers']) == 0, (
            'buffers have to be converted during modify_summary')
        assert len(self.summary['snapshots']) == 0, (
            'snapshots have to be converted during modify_summary')

    def dump_summary(self, trainer):
        iteration = trainer.iteration
        prefix = self.summary_prefix
        time_prefix = f'{prefix}_timings'
        tags = set()

        def check_tag(tag):
            if tag in tags:
                raise AssertionError(
                    f'The tag {tag!r} is used multiple times.\n\n'
                    'Tensorboard has problems when different events have '
                    'the same tag, e.g. you cannot report `grad_norm` as '
                    'scalar and histogram. A common workaround is to append '
                    'an `_` for the histogram (i.e. `grad_norm_`).'
                )
            tags.add(tag)
            return tag

        for key, scalar in self.summary['scalars'].items():
            trainer.writer.add_scalar(
                check_tag(f'{prefix}/{key}'), scalar, iteration)
        for key, scalar in self.summary['timings'].items():
            trainer.writer.add_scalar(
                check_tag(f'{time_prefix}/{key}'),
                np.mean(scalar), iteration)
        for key, histogram in self.summary['histograms'].items():
            tag = check_tag(f'{prefix}/{key}')
            values = np.array(histogram)
            values = values[np.isfinite(values)]
            if values.size == 0:
                # all-NaN histograms (e.g. a diverged loss being reported
                # during shutdown) must not mask the original error
                continue
            trainer.writer.add_histogram(tag, values, iteration)
        for key, audio in self.summary['audios'].items():
            tag = check_tag(f'{prefix}/{key}')
            if isinstance(audio, (tuple, list)):
                assert len(audio) == 2, (len(audio), audio)
                _add_audio(trainer.writer, tag, audio[0], iteration,
                           sample_rate=audio[1])
            else:
                _add_audio(trainer.writer, tag, audio, iteration,
                           sample_rate=16000)
        for key, image in self.summary['images'].items():
            trainer.writer.add_image(
                check_tag(f'{prefix}/{key}'), image, iteration)
        for key, text in self.summary['texts'].items():
            trainer.writer.add_text(
                check_tag(f'{prefix}/{key}'), text, iteration)
        for key, figure in self.summary['figures'].items():
            trainer.writer.add_figure(
                check_tag(f'{prefix}/{key}'), figure, iteration)
        self.reset_summary()

    def pre_step(self, trainer):
        if self.trigger(iteration=trainer.iteration, epoch=trainer.epoch) \
                and trainer.iteration != 0:
            self.finalize_summary(trainer)
            self.dump_summary(trainer)
        if self.create_snapshot:
            trainer.model.create_snapshot = True

    def post_step(self, trainer, example, model_out, review):
        self.update_summary(review)
        if self.create_snapshot:
            trainer.model.create_snapshot = self.create_snapshot = False

    def post_optimize(self, trainer, summary):
        self.post_step(trainer, None, None, summary)

    def close(self, trainer):
        self.finalize_summary(trainer)
        self.dump_summary(trainer)

    def set_last(self, iteration, epoch):
        self.reset_summary()  # reset needed for backoff
        super().set_last(iteration, epoch)


def _fetch_audio(value):
    if isinstance(value, (tuple, list)):
        return (_fetch(value[0]), value[1])
    return _fetch(value)


def _add_audio(writer, tag, signal, step, sample_rate):
    """writer.add_audio, with a stdlib-WAV fallback when the optional
    soundfile dependency (used by tensorboardX for encoding) is absent."""
    try:
        writer.add_audio(tag, signal, step, sample_rate=sample_rate)
    except (ImportError, ModuleNotFoundError):
        import io
        import wave
        from tensorboardX.proto.summary_pb2 import Summary
        data = np.clip(np.asarray(signal).flatten(), -1, 1)
        pcm = (data * 32767).astype('<i2').tobytes()
        buf = io.BytesIO()
        with wave.open(buf, 'wb') as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(int(sample_rate))
            w.writeframes(pcm)
        audio = Summary.Audio(
            sample_rate=float(sample_rate),
            num_channels=1,
            length_frames=len(data),
            encoded_audio_string=buf.getvalue(),
            content_type='audio/wav',
        )
        writer._get_file_writer().add_summary(
            Summary(value=[Summary.Value(tag=tag, audio=audio)]), step)


class CheckpointHook(TriggeredHook):
    """Periodically saves trainer state. Reference: ``hooks.py:409``."""

    @property
    def priority(self):
        return Priority.CHECKPOINT

    def _save_latest_checkpoint(self, trainer):
        checkpoint_path = trainer.default_checkpoint_path()
        if _is_primary():
            checkpoint_path.parent.mkdir(parents=True, exist_ok=True)
        trainer.save_checkpoint()

    def pre_step(self, trainer):
        if self.trigger(iteration=trainer.iteration, epoch=trainer.epoch):
            self._save_latest_checkpoint(trainer)

    def close(self, trainer):
        self._save_latest_checkpoint(trainer)

    def set_last(self, iteration, epoch):
        # composite triggers (Any/All/Not) have no single ``last``;
        # their sub-triggers handle the rewind via plain set_last
        last = getattr(self.trigger, 'last', None)
        if last is not None and last[0] > iteration:
            # has to be re-triggered after backoff rewound the iteration
            super().set_last(-1, -1)
        else:
            super().set_last(iteration, epoch)


class ValidationHook(SummaryHook):
    """Validation + checkpoint ranking + stale-checkpoint deletion.

    Reference parity: ``hooks.py:439``.
    """

    def __init__(
            self, trigger, iterator, metric='loss', maximize=False,
            max_checkpoints=1, early_stopping_patience=None,
    ):
        super().__init__(trigger, summary_prefix='validation')
        self.iterator = iterator
        # what to rank by
        self.metric, self.maximize = metric, maximize
        self.max_checkpoints = max_checkpoints
        self.early_stopping_patience = early_stopping_patience
        # resumable state (see state_dict)
        self.ckpt_ranking, self.n_degradations = [], 0
        self.last_validation = -1

    @property
    def priority(self):
        return Priority.VALIDATION

    @property
    def _best_ckpt_name(self):
        ext = (Path(self.ckpt_ranking[0][0]).suffix
               if self.ckpt_ranking else CKPT_EXT)
        return f'ckpt_best_{self.metric}{ext}'

    def state_dict(self):
        return {
            'ckpt_ranking': [list(pair) for pair in self.ckpt_ranking],
            'n_degradations': self.n_degradations,
        }

    def load_state_dict(self, state_dict):
        self.ckpt_ranking = [tuple(pair)
                             for pair in state_dict['ckpt_ranking']]
        self.n_degradations = int(state_dict['n_degradations'])

    def finalize_summary(self, trainer):
        # Uses the validate timer instead of the train timer.
        assert len(self.summary['timings']) == 0, self.summary['timings']
        self._materialize_summary()
        for key, timing in self.compute_timings(
                trainer.validate_timer).items():
            self.summary['timings'][key] = timing
        self.summary = trainer.model.modify_summary(self.summary)

    def pre_step(self, trainer):
        if self.trigger(iteration=trainer.iteration, epoch=trainer.epoch):
            self.run_validation(trainer)
            self.last_validation = trainer.iteration
        if (
                self.early_stopping_patience is not None
                and self.n_degradations > self.early_stopping_patience
        ):
            print(f'Early stopping after {trainer.epoch} epochs and '
                  f'{trainer.iteration} iterations')
            raise StopTraining

    def run_validation(self, trainer):
        """Full validation pass -> score -> checkpoint ranking update.

        The checkpoint for this iteration does not exist yet: the
        CheckpointHook runs at lower priority and writes it *after* this
        hook, so the ranking entry recorded here (hook state) is part of
        that very checkpoint.
        """
        score = self._validation_score(trainer)
        # async checkpointing: pruning below must not race an
        # in-flight writer thread — an uncommitted checkpoint would be
        # dropped from the ranking (stale.exists() False) yet land on
        # disk after the rename, leaked forever; and latest.resolve()
        # could observe the unlink/symlink window mid-repoint
        getattr(trainer, 'wait_for_checkpoint_writes', lambda: None)()
        self._rank_checkpoint(
            trainer.checkpoint_dir,
            trainer.default_checkpoint_path().name,
            score,
        )

    def _validation_score(self, trainer):
        """Run the model over the validation set; returns the metric."""
        assert not any(self.summary.values()), (
            'summary not drained before validation', self.summary)
        assert not trainer.validate_timer.timings, trainer.validate_timer
        print('Starting Validation')
        # snapshots (images/audio) only for the first example; the flag
        # is restored afterwards
        snapshot_before = trainer.model.create_snapshot
        trainer.model.create_snapshot = True
        n_examples = 0
        try:
            for _, _, review in trainer.validate(self.iterator):
                trainer.model.create_snapshot = False
                self.update_summary(review)
                n_examples += 1
        finally:
            trainer.model.create_snapshot = snapshot_before
        if n_examples == 0:
            raise RuntimeError(
                f'Validation iterator yielded no examples: '
                f'{self.iterator!r}')

        # modify_summary must see eval mode
        trainer.model.eval()
        try:
            self.finalize_summary(trainer)
        finally:
            trainer.model.train()
        scalars = self.summary['scalars']
        if self.metric not in scalars:
            raise KeyError(
                f'Validation metric {self.metric!r} missing from the '
                f'review scalars {sorted(scalars)}; return it from '
                f'review()/modify_summary().')
        score = float(scalars[self.metric])
        self.dump_summary(trainer)
        print(f'Finished Validation. Mean {self.metric}: {score}')
        return score

    def _rank_checkpoint(self, ckpt_dir, ckpt_name, score):
        """Insert (ckpt_name, score) into the ranking, prune checkpoints
        beyond max_checkpoints, track degradations, persist the ranking.

        Names are stored relative so the storage dir stays movable; ties
        go to the older checkpoint (natural name order).
        """
        self.ckpt_ranking.append((ckpt_name, score))
        sign = -1.0 if self.maximize else 1.0
        self.ckpt_ranking.sort(
            key=lambda entry: (sign * entry[1], _natkey(entry[0])))
        if self.max_checkpoints is not None:
            # the latest checkpoint must survive pruning even when it
            # ranks badly: until the CheckpointHook (lower priority)
            # writes this round's checkpoint and repoints the symlink,
            # deleting it would leave ckpt_latest dangling if the
            # process dies in between (crash-resume would find nothing)
            # derive the extension from the checkpoint being written
            # (orbax trainers use .orbax, not CKPT_EXT)
            ext = Path(ckpt_name).suffix or CKPT_EXT
            latest = ckpt_dir / f'ckpt_latest{ext}'
            # resolve on the primary only and broadcast: workers may not
            # see the storage FS, and the pruning DECISION must be
            # identical on every process (hook state stays in lockstep)
            from padertorch_tpu.parallel import multihost
            latest_target = multihost.broadcast_obj(
                latest.resolve().name
                if _is_primary() and latest.is_symlink() else None)
            kept = []
            for index, (name, value) in enumerate(self.ckpt_ranking):
                if (index < self.max_checkpoints
                        or name == ckpt_name       # being written now
                        or name == latest_target):  # crash-resume anchor
                    kept.append((name, value))
                    continue
                stale = ckpt_dir / name
                # backoff may have removed it already
                if _is_primary() and stale.exists():
                    _remove_checkpoint(stale)
            self.ckpt_ranking = kept
        if self.ckpt_ranking[0][0] == ckpt_name:
            self.n_degradations = 0
        else:
            self.n_degradations += 1
        # persist next to the checkpoints (reference layout:
        # checkpoints/ckpt_ranking.json); primary-only write
        if _is_primary():
            import json
            ckpt_dir.mkdir(parents=True, exist_ok=True)
            (ckpt_dir / 'ckpt_ranking.json').write_text(json.dumps({
                'metric': self.metric,
                'maximize': self.maximize,
                'ranking': [list(pair) for pair in self.ckpt_ranking],
            }, indent=2))

    def post_step(self, trainer, example, model_out, review):
        if trainer.iteration == self.last_validation:
            ckpt_dir = trainer.checkpoint_dir
            ckpt_path = trainer.default_checkpoint_path()
            # async checkpointing: the CheckpointHook's save may still
            # be writing in the background; the contract below (the
            # ranked checkpoint exists on disk) needs it committed
            getattr(trainer, 'wait_for_checkpoint_writes',
                    lambda: None)()
            if not _is_primary():
                return  # FS checks + symlink are primary-only
            if not ckpt_path.exists():
                raise RuntimeError(
                    'Before each validation the CheckpointHook has to '
                    f'write a checkpoint.\nCould not find {ckpt_path}.\n'
                    f'Found only:\n'
                    f'{[str(f) for f in ckpt_dir.iterdir()]}'
                )
            self.set_best_symlink(ckpt_dir)

    def set_best_symlink(self, ckpt_dir):
        best = ckpt_dir / self._best_ckpt_name
        if best.is_symlink():
            best.unlink()
        try:
            best.symlink_to(self.ckpt_ranking[0][0])
        except FileExistsError:
            raise FileExistsError(
                f'Best checkpoint {best} needs to be a symlink to a '
                'checkpoint, not a file!'
            ) from None

    def close(self, trainer):
        # ckpt_ranking may be empty when training stops before the
        # first validation fired (composite trigger, early crash) even
        # though the CheckpointHook created the directory — there is
        # no best checkpoint to link then
        if _is_primary() and trainer.checkpoint_dir.exists() \
                and self.ckpt_ranking:
            self.set_best_symlink(trainer.checkpoint_dir)
        ckpt_name = trainer.default_checkpoint_path().name
        if ckpt_name not in [c[0] for c in self.ckpt_ranking]:
            # ensure it is deleted after resume
            self.ckpt_ranking.append(
                (ckpt_name, -np.inf if self.maximize else np.inf))


class BackOffValidationHook(ValidationHook):
    """Validation + learning-rate backoff to the best checkpoint.

    Reference parity: ``hooks.py:636``.
    """

    def __init__(
            self, trigger, iterator, metric='loss', maximize=False,
            max_checkpoints=1, early_stopping_patience=None, n_back_off=0,
            lr_update_factor=1 / 10, back_off_patience=None,
    ):
        super().__init__(
            trigger, iterator, metric=metric, maximize=maximize,
            max_checkpoints=max_checkpoints,
            early_stopping_patience=early_stopping_patience,
        )
        self.remaining_back_offs = n_back_off
        self.lr_update_factor = lr_update_factor
        if n_back_off > 0:
            assert lr_update_factor < 1, lr_update_factor
            assert back_off_patience is not None
        self.back_off_patience = back_off_patience
        if early_stopping_patience is not None \
                and back_off_patience is not None:
            assert early_stopping_patience >= back_off_patience, (
                early_stopping_patience, back_off_patience)

    def state_dict(self):
        return {
            'remaining_back_offs': self.remaining_back_offs,
            **super().state_dict(),
        }

    def load_state_dict(self, state_dict):
        super().load_state_dict(state_dict)
        assert state_dict['remaining_back_offs'] <= self.remaining_back_offs
        self.remaining_back_offs = int(state_dict['remaining_back_offs'])

    def run_validation(self, trainer):
        super().run_validation(trainer)
        if (
                self.remaining_back_offs > 0
                and self.n_degradations > self.back_off_patience
        ):
            self._back_off(trainer)

    def _back_off(self, trainer):
        best_ckpt = self.ckpt_ranking[0][0]
        print(f'Back off to {best_ckpt}.')
        ckpt_dir = trainer.checkpoint_dir
        if _is_primary():
            latest = (ckpt_dir / f'ckpt_latest{trainer.ckpt_ext}'
                      ).absolute()
            if latest.is_symlink():
                latest.unlink()
            latest.symlink_to(best_ckpt)

        best_iter = int(Path(best_ckpt).stem[len('ckpt_'):])
        for j in reversed(range(len(self.ckpt_ranking))):
            ckpt = self.ckpt_ranking[j][0]
            if int(Path(ckpt).stem[len('ckpt_'):]) > best_iter:
                # the ranking pop must happen on EVERY process (state
                # lockstep); only the file removal is primary-gated
                if _is_primary():
                    ckpt_path = ckpt_dir / ckpt
                    if ckpt_path.exists():
                        _remove_checkpoint(ckpt_path)
                self.ckpt_ranking.pop(j)
        from padertorch_tpu.parallel import multihost
        # the symlink repoint must commit before any process resolves it
        multihost.barrier('back_off')

        remaining_back_offs = self.remaining_back_offs
        trainer.load_checkpoint()
        self.n_degradations = 0
        self.remaining_back_offs = remaining_back_offs - 1

        def update_lr(opt):
            opt.lr = opt.lr * self.lr_update_factor

        optimizer = trainer.optimizer
        if isinstance(optimizer, dict):
            for opt in optimizer.values():
                update_lr(opt)
        else:
            update_lr(optimizer)


class LRSchedulerHook(TriggeredHook):
    """Applies a learning-rate schedule ``fn(step_count) -> lr``.

    TPU-native replacement of the reference's torch scheduler wrapper
    (``hooks.py:745``): any callable — including optax schedules like
    ``optax.exponential_decay`` — maps the trigger count to an absolute lr.
    """

    def __init__(self, lr_scheduler, trigger=(1, 'epoch'),
                 optimizer_key=None):
        super().__init__(trigger)
        self.lr_scheduler = lr_scheduler
        self.optimizer_key = optimizer_key
        self._count = 0

    def state_dict(self):
        return {'count': self._count}

    def load_state_dict(self, state_dict):
        self._count = int(state_dict['count'])
        self._apply_pending = True

    def _optimizer(self, trainer):
        opt = trainer.optimizer
        if self.optimizer_key is not None:
            opt = opt[self.optimizer_key]
        return opt

    def pre_step(self, trainer):
        if getattr(self, '_apply_pending', False):
            # resume: re-apply the scheduled lr for the RESTORED count
            # immediately — the checkpointed opt-state lr may predate a
            # changed schedule fn, and the next trigger fire could be a
            # whole period away
            self._apply_pending = False
            self._optimizer(trainer).lr = float(
                self.lr_scheduler(self._count))
        if self.trigger(iteration=trainer.iteration, epoch=trainer.epoch):
            if trainer.iteration > 0:
                self._count += 1
            self._optimizer(trainer).lr = float(
                self.lr_scheduler(self._count))

    def set_last(self, iteration, epoch):
        super().set_last(iteration, epoch)
        if hasattr(self.trigger, 'unit'):
            if self.trigger.unit == 'epoch':
                self._count = epoch // self.trigger.period
            else:
                self._count = iteration // self.trigger.period
        # composite triggers: keep the checkpointed/initial count —
        # there is no single period to derive it from


class ProgressBarHook(TriggeredHook):
    """tqdm progress bar. Reference parity: ``hooks.py:794``."""

    def __init__(self, stop_trigger, max_it_len=None, update_interval=100):
        super().__init__((update_interval, 'iteration'))
        from tqdm import tqdm
        if isinstance(stop_trigger, EndTrigger):
            length, unit = stop_trigger.period, stop_trigger.unit
        elif isinstance(stop_trigger, (tuple, list)):
            length, unit = stop_trigger
        else:
            raise ValueError(
                f'stop_trigger must be a trigger or tuple, got '
                f'{type(stop_trigger)}: {stop_trigger}')
        if unit == 'iteration':
            max_iteration = length
        elif unit == 'epoch':
            if max_it_len is not None:
                max_iteration = length * max_it_len
            else:
                self.num_epochs = length
                max_iteration = None
        else:
            raise ValueError(f'unit {unit} unknown')
        self.pbar = tqdm(initial=1, total=max_iteration, smoothing=1)

    @property
    def priority(self):
        return Priority.PROGRESS

    def set_last(self, iteration, epoch):
        super().set_last(iteration, epoch)
        self.pbar.n = iteration

    def pre_step(self, trainer):
        iteration, epoch = trainer.iteration, trainer.epoch
        if epoch == 1 and self.pbar.total is None:
            if hasattr(self, 'num_epochs'):
                self.pbar.total = (iteration + 1) * self.num_epochs
        if self.trigger(iteration, epoch) and iteration > 1:
            self.pbar.update(iteration - self.pbar.n)

    def close(self, trainer):
        self.pbar.close()


class StopTrainingHook(TriggeredHook):
    """Raises StopTraining when the end trigger fires."""

    def __init__(self, trigger):
        super().__init__(EndTrigger.new(trigger))

    @property
    def priority(self):
        return Priority.END

    def pre_step(self, trainer):
        if self.trigger(trainer.iteration, trainer.epoch):
            print(f'Training ended after {trainer.epoch} epochs and '
                  f'{trainer.iteration} iterations')
            raise StopTraining


class StopTraining(Exception):
    """Signal to stop the training loop."""


class AnnealingHook(TriggeredHook):
    """Piecewise-linear annealing of a value, relative to its initial value.

    Reference parity: ``hooks.py:884``.  Breakpoints are (x, y) pairs with
    y relative to the initial value.
    """

    def __init__(self, trigger, breakpoints, unit, name):
        super().__init__(trigger)
        self.breakpoints = sorted(breakpoints, key=lambda x: x[0])
        self.unit = unit
        self.name = name
        self.scale = None

    @property
    def uid(self):
        return super().uid + f'({self.name})'

    def get_value(self, trainer):
        raise NotImplementedError

    def set_value(self, trainer, value):
        raise NotImplementedError

    def state_dict(self):
        return {'scale': self.scale}

    def load_state_dict(self, state_dict):
        self.scale = state_dict['scale']

    def pre_step(self, trainer):
        if self.trigger(iteration=trainer.iteration, epoch=trainer.epoch):
            if self.scale is None:
                self.scale = float(np.asarray(self.get_value(trainer)))
            if self.unit == 'iteration':
                x = trainer.iteration
            elif self.unit == 'epoch':
                x = trainer.epoch
            else:
                raise ValueError(f'{self.unit} is not a valid unit.')
            value = self._interpolate(x)
            self.set_value(trainer, value * self.scale)

    def _interpolate(self, x):
        """Piecewise-linear lookup over the sorted breakpoints; the
        implicit origin is (0, 1.0) and the curve is flat past the end."""
        import bisect
        xs = [bx for bx, _ in self.breakpoints]
        i = bisect.bisect_right(xs, x)
        if i == len(self.breakpoints):
            return self.breakpoints[-1][1]
        x0, y0 = (0, 1.0) if i == 0 else self.breakpoints[i - 1]
        x1, y1 = self.breakpoints[i]
        return y0 + (y1 - y0) * (x - x0) / (x1 - x0)


class LossWeightAnnealingHook(AnnealingHook):
    """Anneals an entry of ``trainer.loss_weights``."""

    def get_value(self, trainer):
        return trainer.loss_weights[self.name]

    def set_value(self, trainer, value):
        trainer.loss_weights[self.name] = value


class ModelAttributeAnnealingHook(AnnealingHook):
    """Anneals a (dotted) attribute of the trainer's model."""

    def get_module(self, trainer):
        module = trainer.model
        for attr in self.name.split('.')[:-1]:
            module = getattr(module, attr)
        return module

    def get_value(self, trainer):
        return getattr(self.get_module(trainer), self.name.split('.')[-1])

    def set_value(self, trainer, value):
        setattr(self.get_module(trainer), self.name.split('.')[-1], value)


class LRAnnealingHook(AnnealingHook):
    """Anneals an optimizer learning rate (device scalar; no retrace)."""

    def __init__(self, trigger, breakpoints, unit, name=None):
        super().__init__(trigger, breakpoints, unit, name)

    @property
    def uid(self):
        if self.name is None:
            return type(self).__qualname__
        return super().uid

    def _optimizer(self, trainer):
        optimizer = trainer.optimizer
        if self.name is not None:
            assert isinstance(optimizer, dict), type(optimizer)
            optimizer = optimizer[self.name]
        return optimizer

    def get_value(self, trainer):
        return self._optimizer(trainer).lr

    def set_value(self, trainer, value):
        self._optimizer(trainer).lr = value


class JaxProfilerHook(TriggeredHook):
    """Capture a device profiler trace during training.

    Reference parity-plus: the reference's tracing is host-side timers
    (``ContextTimerDict``) and the cb module tracker (SURVEY.md §5);
    on TPU the actionable view is the XLA device trace.  When the
    trigger fires, this hook records ``num_steps`` training steps with
    ``jax.profiler`` into ``storage_dir/profile`` — open it with
    TensorBoard's profile plugin or ``xprof``.

    >>> hook = JaxProfilerHook((500, 'iteration'), num_steps=3)
    """

    def __init__(self, trigger=(500, 'iteration'), num_steps=5,
                 log_dir=None):
        super().__init__(trigger)
        self.num_steps = num_steps
        self.log_dir = log_dir
        self._remaining = 0
        self._active = False

    @property
    def priority(self):
        return Priority.DEFAULT

    def pre_step(self, trainer):
        import jax
        if self._active:
            self._remaining -= 1
            if self._remaining <= 0:
                jax.profiler.stop_trace()
                self._active = False
                print(f'JaxProfilerHook: trace written to '
                      f'{self._dir(trainer)}')
            return
        if self.trigger(trainer.iteration, trainer.epoch):
            jax.profiler.start_trace(str(self._dir(trainer)))
            self._active = True
            self._remaining = self.num_steps

    def _dir(self, trainer):
        if self.log_dir is not None:
            return Path(self.log_dir)
        return Path(trainer.storage_dir) / 'profile'

    def close(self, trainer):
        if self._active:
            import jax
            jax.profiler.stop_trace()
            self._active = False


class EnergyEstimateHook(TriggeredHook):
    """Dependency-free energy/CO2 estimate -> tensorboard scalars.

    The reference's ``EmissionsTrackerHook`` (``hooks.py:1032``) wraps
    codecarbon, which is absent in this environment and reads RAPL/GPU
    counters that do not exist for TPU anyway.  This hook estimates from
    wall-clock instead: ``energy = elapsed * (chip TDP + host power)``,
    ``co2 = energy * grid carbon intensity``.  The defaults are a v5e
    chip budget and the global-average grid; both are configurable, so
    the numbers are an auditable upper-bound proxy rather than a
    measurement.

    Writes ``<prefix>/energy_kwh``, ``<prefix>/co2_kg`` and
    ``<prefix>/avg_power_watts`` at every trigger fire and at close.
    """

    def __init__(self, trigger=(1, 'epoch'), prefix='x_emissions',
                 chip_watts=200.0, host_watts=100.0,
                 grid_kg_co2_per_kwh=0.475):
        super().__init__(trigger)
        self.prefix = prefix
        self.watts = float(chip_watts) + float(host_watts)
        self.grid_kg_co2_per_kwh = float(grid_kg_co2_per_kwh)
        self._start = None

    @property
    def priority(self):
        return Priority.SUMMARY

    def state_dict(self):
        # carry consumed energy over resume
        return {'consumed_kwh_before': self._consumed_kwh()}

    def load_state_dict(self, state_dict):
        self._kwh_before = float(state_dict['consumed_kwh_before'])

    _kwh_before = 0.0

    def _consumed_kwh(self):
        import time
        if self._start is None:
            return self._kwh_before
        elapsed_h = (time.monotonic() - self._start) / 3600.0
        return self._kwh_before + elapsed_h * self.watts / 1000.0

    def _report(self, trainer):
        energy_kwh = self._consumed_kwh()
        trainer.writer.add_scalar(
            f'{self.prefix}/energy_kwh', energy_kwh, trainer.iteration)
        trainer.writer.add_scalar(
            f'{self.prefix}/co2_kg',
            energy_kwh * self.grid_kg_co2_per_kwh, trainer.iteration)
        trainer.writer.add_scalar(
            f'{self.prefix}/avg_power_watts', self.watts,
            trainer.iteration)

    def pre_step(self, trainer):
        import time
        if self._start is None:
            self._start = time.monotonic()
        if self.trigger(iteration=trainer.iteration, epoch=trainer.epoch):
            self._report(trainer)

    def close(self, trainer):
        if self._start is not None:
            self._report(trainer)


class EMAHook(Hook):
    """Exponential moving average of the parameters (Polyak averaging).

    Beyond the reference (which has SWA only in contrib/je): EMA weights
    are standard for vocoder/GAN training (e.g. the official BigVGAN /
    ParallelWaveGAN recipes evaluate the averaged generator).  The
    average updates **on device** after every optimizer step — one small
    jitted ``ema = d * ema + (1 - d) * p`` program, no host transfers —
    and checkpoints/restores with the trainer (``state_dict``).

    Usage::

        ema = EMAHook(decay=0.999)
        trainer.register_hook(ema)
        trainer.train(ds)
        with ema.average_parameters(trainer.model):
            evaluate(trainer.model)        # runs with EMA weights

    The first optimizer step initializes the average with a copy of the
    parameters.
    """

    def __init__(self, decay=0.999):
        assert 0.0 < decay < 1.0, decay
        self.decay = decay
        self.ema_params = None
        self._update = None

    def _make_update(self):
        import jax
        decay = self.decay

        @jax.jit
        def update(ema, p):
            return jax.tree_util.tree_map(
                lambda e, x: decay * e + (1.0 - decay) * x, ema, p)
        return update

    def post_optimize(self, trainer, summary):
        from padertorch_tpu.module import partition
        import jax
        params, _ = partition(trainer.model)
        if self.ema_params is None:
            self.ema_params = jax.tree_util.tree_map(jnp.copy, params)
            return
        if self._update is None:
            self._update = self._make_update()
        self.ema_params = self._update(self.ema_params, params)

    @contextmanager
    def average_parameters(self, model):
        """Temporarily swap the EMA average into ``model``."""
        from padertorch_tpu.module import partition, inplace_update
        import jax
        assert self.ema_params is not None, 'no optimizer step ran yet'
        params, static = partition(model)
        backup = params
        inplace_update(model, self.ema_params, static)
        try:
            yield model
        finally:
            _, static = partition(model)
            inplace_update(model, backup, static)

    def state_dict(self):
        if self.ema_params is None:
            return {'decay': self.decay}
        import jax
        leaves = jax.tree_util.tree_leaves(self.ema_params)
        return {'decay': self.decay,
                'leaves': [np.asarray(l) for l in leaves]}

    def load_state_dict(self, state):
        self.decay = float(state['decay'])
        self._loaded_leaves = state.get('leaves')

    def pre_step(self, trainer):
        # finish a deferred restore once the model is available
        leaves = getattr(self, '_loaded_leaves', None)
        if leaves is not None:
            import jax
            from padertorch_tpu.module import partition
            params, _ = partition(trainer.model)
            treedef = jax.tree_util.tree_structure(params)
            self.ema_params = jax.tree_util.tree_unflatten(
                treedef, [jnp.asarray(l) for l in leaves])
            self._loaded_leaves = None


#: reference name for :class:`EnergyEstimateHook` (there
#: ``EmissionsTrackerHook``, ``train/hooks.py:893``)
EmissionsTrackerHook = EnergyEstimateHook
