"""The training loop. Reference parity: ``padertorch/train/trainer.py:35``.

TPU-native design (vs. the reference's eager torch loop):

- **One jitted step.** ``forward`` + ``review`` + backward + gradient clip +
  optimizer update compile into a single XLA program:
  ``(params, buffers, opt_state, example, key) -> (params', buffers',
  opt_state', loss, out, review, grad_norm)``.  XLA fuses the optimizer
  math into the backward pass; there is no per-op dispatch.
- **Async dispatch.** The host loop enqueues steps and reads results one
  step late; scalars returned in the review are device arrays fetched only
  when a summary is written.  The non-finite-loss check (reference
  ``trainer.py:624``) runs one step delayed so it never blocks the pipeline.
- **Virtual minibatch** (gradient accumulation, reference ``trainer.py:357``)
  keeps the reference's *sum* (not mean) semantics: grads of
  ``virtual_minibatch_size`` examples are accumulated on device, then one
  fused apply step runs.
- **Buffers** (running statistics) update functionally: in-jit attribute
  writes on the traced module copy are captured by re-partitioning the
  module returned from the loss closure.
- **Data parallelism** is a sharding, not threads: pass ``sharding=`` (a
  ``jax.sharding.NamedSharding`` over a data mesh axis) and batches are
  placed as global sharded arrays; gradient reduction happens inside the
  same XLA program over ICI (see ``padertorch_tpu/parallel``).
"""
import itertools
import sys
import time
from collections import defaultdict
from contextlib import contextmanager
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

from padertorch_tpu.configurable import Configurable
from padertorch_tpu.base import Model
from padertorch_tpu import module as ptmodule
from padertorch_tpu.module import partition, combine
from padertorch_tpu import random as ptrandom
from padertorch_tpu.serialize import dump_state, load_state
from padertorch_tpu.train.optimizer import Optimizer, Adam
from padertorch_tpu.train.precision import Precision
from padertorch_tpu.train.hooks import (
    SummaryHook,
    CheckpointHook,
    StopTrainingHook,
    BackOffValidationHook,
    ProgressBarHook,
    StopTraining,
)

__all__ = ['Trainer', 'ContextTimerDict']

CKPT_EXT = '.ptt'


class ContextTimerDict:
    """Collect wall times per phase via context managers, with pause.

    Reference parity: ``train/trainer.py:944``.

    >>> timer = ContextTimerDict()
    >>> with timer['foo']:
    ...     pass
    >>> sorted(timer.as_dict.keys())
    ['foo']
    """

    def __init__(self):
        self.timings = defaultdict(list)

    @contextmanager
    def __getitem__(self, key):
        assert isinstance(key, str), key
        handle = _TimerHandle()
        start = time.perf_counter()
        handle._start = start
        try:
            yield handle
        finally:
            stop = time.perf_counter()
            self.timings[key].append(stop - start - handle.paused_total)

    @staticmethod
    def timestamp():
        return time.perf_counter()

    @property
    def as_dict(self):
        return {k: np.array(v) for k, v in self.timings.items()}

    def clear(self):
        self.timings.clear()

    def __repr__(self):
        return f'{type(self).__name__}({dict(self.timings)})'


class _TimerHandle:
    def __init__(self):
        self.paused_total = 0.0
        self._start = None

    @contextmanager
    def pause(self):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.paused_total += time.perf_counter() - t0


class Trainer(Configurable):
    """Owns the model, optimizer(s), storage dir layout and the train loop.

    Storage dir structure (same contract as the reference)::

        .
        ├── checkpoints
        │   ├── ckpt_7122.ptt
        │   ├── ckpt_14244.ptt
        │   ├── ckpt_best_loss.ptt -> ckpt_7122.ptt
        │   └── ckpt_latest.ptt -> ckpt_14244.ptt
        ├── events.out.tfevents.*
    """

    @classmethod
    def finalize_dogmatic_config(cls, config):
        if 'optimizer' not in config.keys():
            config['optimizer'] = {'factory': Adam}

    def __init__(
            self,
            model: Model,
            storage_dir,
            optimizer,
            loss_weights=None,
            adversarial=False,
            summary_trigger=(1, 'epoch'),
            checkpoint_trigger=(1, 'epoch'),
            stop_trigger=(1, 'epoch'),
            virtual_minibatch_size=1,
            seed=0,
            jit=True,
            sharding=None,
            checkpoint_format='ptt',
            async_checkpointing=False,
            precision=None,
    ):
        if not isinstance(model, ptmodule.Module):
            raise TypeError(
                'Expect the model to be a subclass of '
                'padertorch_tpu.Module.\n'
                f'Got: type: {type(model)}\n{model}'
            )
        self.model = model

        self.adversarial = bool(adversarial)
        if self.adversarial and not isinstance(optimizer, dict):
            raise TypeError(
                'adversarial=True requires a dict of optimizers keyed by '
                'submodule name (e.g. {"generator": ..., '
                '"discriminator": ...}), got ' + repr(type(optimizer))
            )
        if isinstance(optimizer, dict):
            # Per-submodule optimizers: keys must name direct submodules.
            optimizer = {
                k: opti for k, opti in optimizer.items() if opti is not None
            }
            for key, opti in optimizer.items():
                assert isinstance(opti, Optimizer), opti
                sub = getattr(model, key)
                params, _ = partition(sub)
                opti.set_parameters(params)
        else:
            assert isinstance(optimizer, Optimizer), optimizer
            params, _ = partition(model)
            optimizer.set_parameters(params)
        self.optimizer = optimizer

        self.storage_dir = Path(storage_dir).expanduser().resolve()
        assert checkpoint_format in ('ptt', 'orbax'), \
            checkpoint_format
        self.checkpoint_format = checkpoint_format
        self.async_checkpointing = bool(async_checkpointing)
        self._ckpt_writer = None
        self._ckpt_writer_error = None
        self.writer = None
        self.train_timer = ContextTimerDict()
        self.validate_timer = ContextTimerDict()
        self.iteration = -1
        self.epoch = -1
        self.device = None  # parity; jax manages placement

        self.loss_weights = loss_weights
        self.virtual_minibatch_size = virtual_minibatch_size
        self.seed = seed
        self.jit = jit
        if isinstance(precision, str):
            precision = Precision(precision)
        assert precision is None or isinstance(precision, Precision), \
            precision
        self.precision = precision
        self.sharding = sharding
        if getattr(sharding, 'fsdp', False):
            # FSDP (ZeRO-3): parameters sharded over the data axis
            self.model = sharding.shard_module(self.model)
        if getattr(sharding, 'zero', False):
            # ZeRO-1: optimizer state sharded over the data axis
            self._set_opt_states(
                sharding.shard_opt_state(self._opt_states))

        self.hooks = [
            SummaryHook(summary_trigger),
            CheckpointHook(checkpoint_trigger),
            StopTrainingHook(stop_trigger),
        ]
        self._summary_trigger = summary_trigger
        self._stop_trigger = stop_trigger
        self._checkpoint_trigger = checkpoint_trigger

        self._base_key = jax.random.PRNGKey(seed)
        self._step_fns = {}
        self._prev_loss = None  # one-step-delayed finite check

        import tensorboardX  # slow import -> lazy
        self.writer_cls = tensorboardX.SummaryWriter

    # ------------------------------------------------------------------ #
    # jitted step construction                                            #
    # ------------------------------------------------------------------ #
    def _loss_and_review(self, model, example, loss_weights):
        """forward + review + loss weighting (traced)."""
        loss, _, model_out, review = self._losses_and_review(
            model, example, loss_weights)
        return loss, model_out, review

    def _losses_and_review(self, model, example, loss_weights):
        """Like :meth:`_loss_and_review` but also returns the dict of
        *weighted* per-key losses (``None`` for single-loss reviews) —
        the adversarial step differentiates each key separately."""
        model_out = model(example)
        review = dict(model.review(example, model_out))
        review.setdefault('scalars', {})
        review['scalars'] = dict(review['scalars'])
        weighted = None
        if 'losses' in review:
            assert 'loss' not in review, review
            losses = review.pop('losses')
            if (len(losses) != 1 and loss_weights is None
                    and not self.adversarial):
                raise Exception(
                    'You can not have multiple losses without specifying '
                    f'loss_weights. losses: {losses}'
                )
            if loss_weights is not None and len(losses) != 1 \
                    and set(loss_weights.keys()) != set(losses.keys()):
                raise Exception(
                    'You can not have multiple losses without specifying a '
                    f'loss_weight for each loss.\nlosses: {losses}\n'
                    f'loss_weights: {loss_weights}'
                )
            loss = 0.0
            weighted = {}
            for key, value in losses.items():
                weight = (loss_weights[key]
                          if loss_weights is not None else 1.0)
                loss = loss + weight * value
                weighted[key] = weight * value
                review['scalars'][key] = value
                review['scalars'][f'{key}_loss_weight'] = jnp.asarray(
                    weight, dtype=jnp.float32)
        else:
            assert 'loss' in review, review
            loss = review.pop('loss')
        assert jnp.ndim(loss) == 0, loss
        review['scalars']['loss'] = loss
        return loss, weighted, model_out, review

    def _make_adversarial_grad_fn(self):
        """Per-optimizer-key objectives (GAN-style training).

        The review must return ``losses`` with exactly the optimizer
        dict's keys.  For each key ``k`` the step takes the gradient of
        ``loss_weights[k] * losses[k]`` with respect to the parameters
        of submodule ``k`` only — so e.g. the discriminator never
        receives the generator's adversarial gradient and no manual
        ``stop_gradient`` bookkeeping is needed in the model.  All
        objectives are differentiated inside ONE jitted step (XLA
        dedupes the shared forward work); each pass replays the same
        PRNG stream so both objectives see identical noise/dropout.
        """
        prec = self.precision
        opt_keys = tuple(self.optimizer.keys())

        def grad_fn(params, static, example, key, loss_weights):
            if prec is not None and prec.cast_examples:
                example = prec.cast_floating(example)
            fwd_static = (prec.cast_floating(static)
                          if prec is not None and prec.cast_buffers
                          else static)

            def make_loss_fn(k):
                def loss_fn(p_k):
                    p = ptmodule._clone_with(params, {k: p_k})
                    if prec is not None:
                        p = prec.cast_floating(p)
                    model = combine(p, fwd_static)
                    # fresh context per pass -> identical draws
                    with ptrandom.key_context(key):
                        loss, weighted, model_out, review = \
                            self._losses_and_review(
                                model, example, loss_weights)
                    if weighted is None or set(weighted) != set(opt_keys):
                        raise Exception(
                            'adversarial=True requires review["losses"] '
                            'keyed exactly like the optimizer dict.\n'
                            f'optimizer keys: {sorted(opt_keys)}\n'
                            'losses keys: '
                            f'{sorted(weighted or {})}'
                        )
                    loss_k = weighted[k]
                    if prec is not None:
                        loss_k = jnp.asarray(loss_k, jnp.float32)
                    return loss_k, (loss, model_out, review, model)
                return loss_fn

            grads = {}
            aux = None
            for k in opt_keys:
                (_, aux), g_k = jax.value_and_grad(
                    make_loss_fn(k), has_aux=True)(getattr(params, k))
                grads[k] = g_k
            loss, model_out, review, model2 = aux
            _, new_static = partition(model2)  # buffers updated in forward
            if prec is not None and prec.cast_buffers:
                new_static = prec.restore_dtypes(new_static, static)
            return loss, model_out, review, grads, new_static
        return grad_fn

    def _make_grad_fn(self):
        if self.adversarial:
            return self._make_adversarial_grad_fn()
        prec = self.precision

        def grad_fn(params, static, example, key, loss_weights):
            if prec is not None and prec.cast_examples:
                example = prec.cast_floating(example)
            fwd_static = (prec.cast_floating(static)
                          if prec is not None and prec.cast_buffers
                          else static)
            with ptrandom.key_context(key):
                def loss_fn(p):
                    if prec is not None:
                        # first traced op per param: the cast's VJP
                        # returns float32 cotangents (master grads)
                        p = prec.cast_floating(p)
                    model = combine(p, fwd_static)
                    loss, model_out, review = self._loss_and_review(
                        model, example, loss_weights)
                    if prec is not None:
                        loss = jnp.asarray(loss, jnp.float32)
                    return loss, (model_out, review, model)

                (loss, (model_out, review, model2)), grads = \
                    jax.value_and_grad(loss_fn, has_aux=True)(params)
            _, new_static = partition(model2)  # buffers updated in forward
            if prec is not None and prec.cast_buffers:
                # master buffers keep their dtype across steps
                new_static = prec.restore_dtypes(new_static, static)
            return loss, model_out, review, grads, new_static
        return grad_fn

    def _opt_step(self, params, grads, opt_states):
        """Apply optimizer(s); returns (params', opt_states', norms)."""
        if isinstance(self.optimizer, dict):
            overrides = {}
            new_states = {}
            norms = {}
            for key, opt in self.optimizer.items():
                p_k = getattr(params, key)
                # adversarial grad_fn returns a plain {key: grads} dict;
                # the joint-loss path returns a module-shaped pytree
                g_k = (grads[key] if isinstance(grads, dict)
                       else getattr(grads, key))
                np_k, ns_k, norm = opt.step(p_k, g_k, opt_states[key])
                overrides[key] = np_k
                new_states[key] = ns_k
                norms[key] = norm
            new_params = ptmodule._clone_with(params, overrides)
            return new_params, new_states, norms
        new_params, new_state, norm = self.optimizer.step(
            params, grads, opt_states)
        return new_params, new_state, {'': norm}

    def _make_train_step(self):
        grad_fn = self._make_grad_fn()

        def train_step(params, static, opt_states, example, key,
                       loss_weights):
            loss, model_out, review, grads, new_static = grad_fn(
                params, static, example, key, loss_weights)
            new_params, new_states, norms = self._opt_step(
                params, grads, opt_states)
            if getattr(self.sharding, 'fsdp', False):
                # keep the updated params FSDP-sharded on the way out
                new_params = self.sharding.constrain_params(new_params)
            if getattr(self.sharding, 'zero', False):
                # keep the updated moments ZeRO-sharded on the way out
                new_states = self.sharding.constrain_opt_state(new_states)
            return (new_params, new_static, new_states, loss, model_out,
                    review, norms)
        return train_step

    def _make_accum_step(self):
        grad_fn = self._make_grad_fn()

        def accum_step(params, static, grad_accum, example, key,
                       loss_weights):
            loss, model_out, review, grads, new_static = grad_fn(
                params, static, example, key, loss_weights)
            if grad_accum is not None:
                grads = jax.tree_util.tree_map(
                    lambda a, g: a + g, grad_accum, grads)
            return loss, model_out, review, grads, new_static
        return accum_step

    def _make_apply_step(self):
        def apply_step(params, opt_states, grads):
            new_params, new_states, norms = self._opt_step(
                params, grads, opt_states)
            if getattr(self.sharding, 'fsdp', False):
                new_params = self.sharding.constrain_params(new_params)
            if getattr(self.sharding, 'zero', False):
                # keep the updated moments ZeRO-sharded on the way out
                new_states = self.sharding.constrain_opt_state(new_states)
            return new_params, new_states, norms
        return apply_step

    _DONATE = {
        # donate old params/static(buffers)/opt_state: the step returns
        # fresh ones, so XLA can reuse their HBM in place (halves peak
        # memory for model + optimizer state)
        'train': (0, 1, 2),
        # accumulation reuses params across microbatches: donate only the
        # grad accumulator and the buffer tree
        'accum': (1, 2),
        'apply': (0, 1, 2),
        'val': (),
    }

    def _get_fn(self, name, factory):
        if name not in self._step_fns:
            fn = factory()
            counter = {'count': 0}

            def counted(*args, __fn=fn, __counter=counter, **kwargs):
                __counter['count'] += 1
                return __fn(*args, **kwargs)

            if self.jit:
                jitted = jax.jit(
                    counted,
                    donate_argnums=self._DONATE.get(name, ()))
            else:
                jitted = counted
            jitted._trace_counter = counter
            self._step_fns[name] = jitted
        return self._step_fns[name]

    @property
    def num_traces(self):
        """Total (re)compilations of the step functions so far.

        A recompilation-storm guard: with bucketed shapes this stays at a
        handful (train/eval x snapshot-flag x shape buckets).
        """
        return {
            name: fn._trace_counter['count']
            for name, fn in self._step_fns.items()
            if hasattr(fn, '_trace_counter')
        }

    def _make_val_step(self):
        prec = self.precision

        def val_step(params, static, example, key, loss_weights):
            if prec is not None:
                # same numerics as the train forward
                if prec.cast_examples:
                    example = prec.cast_floating(example)
                params = prec.cast_floating(params)
                if prec.cast_buffers:
                    static = prec.cast_floating(static)
            with ptrandom.key_context(key):
                model = combine(params, static)
                loss, model_out, review = self._loss_and_review(
                    model, example, loss_weights)
            del loss  # already in review['scalars']
            return model_out, review
        return val_step

    # ------------------------------------------------------------------ #
    # state access                                                        #
    # ------------------------------------------------------------------ #
    @property
    def _opt_states(self):
        if isinstance(self.optimizer, dict):
            return {k: o.opt_state for k, o in self.optimizer.items()}
        return self.optimizer.opt_state

    def _set_opt_states(self, states):
        if isinstance(self.optimizer, dict):
            for k, o in self.optimizer.items():
                o.opt_state = states[k]
        else:
            self.optimizer.opt_state = states

    def _loss_weight_arrays(self):
        """Device arrays for ``self.loss_weights``, memoized on the
        VALUES — the train loop calls this every iteration so runtime
        mutation (``LossWeightAnnealingHook.set_value``) reaches the
        jitted step, while the steady state pays one dict compare."""
        if self.loss_weights is None:
            return None
        key = tuple(sorted(
            (k, float(v)) for k, v in self.loss_weights.items()))
        cached = getattr(self, '_lw_cache', None)
        if cached is not None and cached[0] == key:
            return cached[1]
        arrays = {k: jnp.asarray(v, dtype=jnp.float32)
                  for k, v in self.loss_weights.items()}
        self._lw_cache = (key, arrays)
        return arrays

    def _example_to_device(self, example):
        if hasattr(self.sharding, 'shard'):  # parallel.DataParallel
            return self.sharding.shard(example)
        return self.model.example_to_device(example, self.sharding)

    @staticmethod
    def _strip_host_fields(example):
        """Drop non-numeric leaves (ids, paths) before the jit boundary.

        Hooks still receive the full example; the compiled step only sees
        arrays/scalars (strings cannot be traced by XLA).
        """
        drop = object()

        def strip(obj):
            if isinstance(obj, (str, bytes)) or obj is None:
                return drop
            if isinstance(obj, dict):
                kept = {}
                for k, v in obj.items():
                    s = strip(v)
                    if s is not drop:
                        kept[k] = s
                return kept
            if isinstance(obj, (list, tuple)):
                kept = [s for s in (strip(v) for v in obj)
                        if s is not drop]
                if not kept and len(obj):
                    return drop
                return type(obj)(kept)
            return obj

        out = strip(example)
        return {} if out is drop else out

    def _check_prev_loss_finite(self):
        if self._prev_loss is None:
            return
        loss = np.asarray(self._prev_loss)
        self._prev_loss = None
        if not np.all(np.isfinite(loss)):
            log_path_pattern = self.log_error_state({
                'model_state': ptmodule.state_dict(self.model),
            })
            raise RuntimeError(
                f'The loss ({loss}) is not finite.\n'
                f'See error states in {log_path_pattern}.'
            )

    # ------------------------------------------------------------------ #
    # training                                                            #
    # ------------------------------------------------------------------ #
    def train(
            self,
            train_dataset,
            *,
            progress_bar=False,
            track_emissions=False,
            resume=False,
            device=None,
    ):
        """Train the model. See class docstring for the storage layout.

        ``train_dataset`` must be a re-iterable of examples (not a
        generator).  ``device`` is accepted for reference API parity; on
        TPU, placement is controlled by ``sharding``.
        """
        del device
        from padertorch_tpu.parallel import multihost
        if track_emissions:
            # reference: EmissionsTrackerHook (codecarbon); here the
            # dependency-free wall-clock x TDP estimate.  Registered in
            # self.hooks (not just this call's list) so its consumed-
            # energy state checkpoints and restores with the trainer —
            # which is also why it must be registered BEFORE
            # load_checkpoint below: a checkpoint written with
            # track_emissions carries this hook's state, and
            # load_state_dict asserts every saved hook state found a
            # registered hook.
            from padertorch_tpu.train.hooks import EnergyEstimateHook
            if not any(isinstance(h, EnergyEstimateHook)
                       for h in self.hooks):
                self.hooks.append(
                    EnergyEstimateHook(self._summary_trigger))
        if resume:
            assert resume is True, resume
            self.load_checkpoint()
        else:
            if multihost.is_primary():
                # primary-only: workers may lag behind the primary's
                # first checkpoint write (and may not even see the FS)
                assert not self.checkpoint_dir.exists(), (
                    'A checkpoint directory already exists. If you want '
                    'to restart the training set resume to True.'
                )
            multihost.barrier('fresh_start_check')
            self.iteration = 0
            self.epoch = 0

        self.model.train()

        if multihost.is_primary():
            self.writer = self.writer_cls(str(self.storage_dir))
        else:
            # multi-controller: exactly one tfevents writer (reference
            # analog: rank-0-only IO, padertorch/base.py:152-165); hook
            # STATE still updates on every process so resume stays in
            # lockstep, only the write is a no-op.
            self.writer = _NullWriter()
        hooks = [*self.hooks]
        if progress_bar and not multihost.is_primary():
            progress_bar = False
        if progress_bar:
            try:
                max_it_len = len(train_dataset)
            except TypeError:
                max_it_len = None
            pbh = ProgressBarHook(self._stop_trigger, max_it_len)
            pbh.set_last(self.iteration, self.epoch)
            hooks.append(pbh)
        if track_emissions:
            # registered pre-resume (top of train()); it entered
            # ``hooks`` via [*self.hooks] — just sync its trigger to
            # the (possibly restored) position
            from padertorch_tpu.train.hooks import EnergyEstimateHook
            for h in hooks:
                if isinstance(h, EnergyEstimateHook):
                    h.set_last(self.iteration, self.epoch)
        hooks = sorted(hooks, key=lambda h: h.priority, reverse=True)

        assert self.virtual_minibatch_size >= 1, self.virtual_minibatch_size
        vbs = self.virtual_minibatch_size

        try:
            train_iterable = None
            while True:
                new_epoch = False
                if train_iterable is None:
                    new_epoch = True
                    for hook in hooks:
                        hook.pre_step(self)
                    train_iterable = iter(train_dataset)

                optimize = True
                with self.train_timer['time_per_iteration'] as timer:
                    params, static = partition(self.model)
                    grad_accum = None
                    for minibatch_index in range(vbs):
                        with self.train_timer['time_per_data_loading']:
                            example = list(
                                itertools.islice(train_iterable, 1))
                            if len(example) == 0:
                                train_iterable = None
                                self.epoch += 1
                                if minibatch_index == 0:
                                    optimize = False
                                break
                        example = example[0]

                        if new_epoch:
                            new_epoch = False
                        elif minibatch_index == 0:
                            with timer.pause():
                                for hook in hooks:
                                    hook.pre_step(self)
                            # Hooks may have modified the model (e.g.
                            # create_snapshot / backoff reload).
                            params, static = partition(self.model)

                        key = jax.random.fold_in(
                            self._base_key,
                            self.iteration * vbs + minibatch_index)
                        with self.train_timer['time_per_to_device']:
                            example = self._example_to_device(example)
                        device_example = self._strip_host_fields(example)
                        # per-step (memoized on values): hooks may have
                        # annealed trainer.loss_weights in pre_step
                        loss_weights = self._loss_weight_arrays()

                        if vbs == 1:
                            step = self._get_fn(
                                'train', self._make_train_step)
                            with self.train_timer['time_per_forward']:
                                (params, static, new_states, loss,
                                 model_out, review, norms) = step(
                                    params, static, self._opt_states,
                                    device_example, key, loss_weights)
                            self._set_opt_states(new_states)
                            self._record_optimizer_summary(norms)
                        else:
                            step = self._get_fn(
                                'accum', self._make_accum_step)
                            with self.train_timer['time_per_forward']:
                                (loss, model_out, review, grad_accum,
                                 static) = step(
                                    params, static, grad_accum,
                                    device_example, key, loss_weights)

                        # Sync fresh arrays into the live model right
                        # away: the old ones may have been DONATED to the
                        # step (deleted), and hooks/error dumps read
                        # self.model.
                        ptmodule.inplace_update(self.model, params, static)
                        self._check_prev_loss_finite()
                        self._prev_loss = loss

                        with timer.pause():
                            for hook in hooks:
                                hook.post_step(
                                    self, example, model_out, review)
                        del example, model_out, review
                        # NOTE: with vbs > 1, STATIC model flags hooks
                        # flip mid-window (SummaryHook clears
                        # create_snapshot after the first microbatch)
                        # only take effect at the NEXT window: the
                        # accumulated grads pytree embeds this window's
                        # static aux, so re-partitioning mid-window
                        # would break the accumulation tree.  Cost: a
                        # summary-firing window computes snapshots for
                        # all vbs microbatches and keeps the last.

                    if optimize:
                        with self.train_timer['time_per_optimize']:
                            if vbs > 1 and grad_accum is not None:
                                apply = self._get_fn(
                                    'apply', self._make_apply_step)
                                params, new_states, norms = apply(
                                    params, self._opt_states, grad_accum)
                                self._set_opt_states(new_states)
                                self._record_optimizer_summary(norms)
                                ptmodule.inplace_update(
                                    self.model, params, static)
                            optimizer_summary = self._optimizer_summary
                            self._optimizer_summary = None
                            for hook in hooks:
                                hook.post_optimize(self, optimizer_summary)
                        self.iteration += 1

        except StopTraining:
            pass
        finally:
            # the deferred finite check must neither REPLACE an
            # exception already propagating (that would mask the real
            # error) nor skip hook.close/wait_for_checkpoint_writes/
            # writer.close (leaked tqdm/tfevents, lost async
            # checkpoint errors) — collect it, close everything, then
            # raise it only on an otherwise-clean exit
            finite_exc = None
            try:
                self._check_prev_loss_finite()
            except Exception as e:
                if sys.exc_info()[0] is not None:
                    print(f'Note: also detected while unwinding: {e!r}')
                else:
                    finite_exc = e
            try:
                for hook in hooks:
                    hook.close(self)
                # the final (hook-close) checkpoint may still be in
                # flight — train() must not return before it committed
                self.wait_for_checkpoint_writes()
            except Exception:
                print('Exception in finally. May hide actual exception!!!\n'
                      'You may comment this finally block for debugging.')
                raise
            self.writer.close()
            self.writer = None
            if finite_exc is not None:
                raise finite_exc

    _optimizer_summary = None

    def _record_optimizer_summary(self, norms):
        # Record the *device* lr scalar (opt_state.hyperparams), not
        # optimizer.lr: the property would force a blocking device->host
        # sync on the opt state just returned by the async-dispatched
        # step, every iteration.  SummaryHook's bulk device_get fetches
        # it together with everything else when a summary is written.
        # jnp.copy because the opt state is donated to the next step —
        # the hyperparams buffer itself would dangle.
        summary = {'scalars': {}, 'histograms': {}}
        def lr_scalar(opt):
            # Adafactor(lr=None) runs on its internal relative step
            # size: inject_hyperparams then has NO 'learning_rate'
            # entry — skip the lr report instead of KeyError
            return opt.opt_state.hyperparams.get('learning_rate')

        if isinstance(self.optimizer, dict):
            for key, opt in self.optimizer.items():
                summary['scalars'][f'{key}_grad_norm'] = norms[key]
                summary['histograms'][f'{key}_grad_norm_'] = \
                    jnp.reshape(norms[key], (1,))
                lr = lr_scalar(opt)
                if lr is not None:
                    summary['scalars'][f'lr/{key}/param_group_0'] = \
                        jnp.copy(lr)
        else:
            norm = norms['']
            summary['scalars']['grad_norm'] = norm
            summary['histograms']['grad_norm_'] = jnp.reshape(norm, (1,))
            lr = lr_scalar(self.optimizer)
            if lr is not None:
                summary['scalars']['lr/param_group_0'] = jnp.copy(lr)
        self._optimizer_summary = summary

    # ------------------------------------------------------------------ #
    # validation                                                          #
    # ------------------------------------------------------------------ #
    _non_validation_start_time = None

    def validate(self, validation_iterator):
        """Generator yielding (example, model_out, review) per example.

        Used by the ValidationHook; runs the jitted eval step.
        """
        validation_start_time = self.validate_timer.timestamp()
        if self._non_validation_start_time is not None:
            self.validate_timer.timings['non_validation_time'].append(
                validation_start_time - self._non_validation_start_time)

        with self.validate_timer['validation_time']:
            self.model.eval()
            loss_weights = self._loss_weight_arrays()
            try:
                val_step = self._get_fn('val', self._make_val_step)
                validation_iter = iter(validation_iterator)
                index = 0
                # Re-partition each step: ValidationHook flips
                # model.create_snapshot to False after the first yield,
                # and that flag lives in the static part — partitioning
                # once would bake snapshot=True into every step (wasted
                # compute, and the keep-last summary would record the
                # LAST example's snapshot where the reference records
                # the first's).  Two jit cache entries total
                # (snapshot on/off); the flatten itself is cheap.
                while True:
                    with self.validate_timer['time_per_iteration']:
                        try:
                            with self.validate_timer[
                                    'time_per_data_loading']:
                                example = next(validation_iter)
                        except StopIteration:
                            break
                        params, static = partition(self.model)
                        key = jax.random.fold_in(
                            jax.random.fold_in(
                                self._base_key, 0x7FFFFFFF), index)
                        with self.validate_timer['time_per_to_device']:
                            example = self._example_to_device(example)
                        with self.validate_timer['time_per_forward']:
                            model_out, review = val_step(
                                params, static,
                                self._strip_host_fields(example),
                                key, loss_weights)
                        index += 1
                    yield example, model_out, review
                    del example, model_out, review
            finally:
                self.model.train()
                self._non_validation_start_time = \
                    self.validate_timer.timestamp()

    def train_step(self, model, example, device=None):
        """Single eager train step (API parity; used by tests/debugging)."""
        del device
        return self.step(model, example, self.train_timer)

    def validation_step(self, model, example, device=None):
        del device
        return self.step(model, example, self.validate_timer)[1:]

    def step(self, model, example, timer, device=None):
        """Eager (non-jitted) step: forward + review + loss weighting.

        Reference parity: ``trainer.py:541``.  Used for debugging and the
        burn test's spying; the hot path uses the jitted fused step.
        """
        del device
        with timer['time_per_to_device']:
            example = model.example_to_device(example, self.sharding)
        key = jax.random.fold_in(self._base_key, max(self.iteration, 0))
        with ptrandom.key_context(key):
            with timer['time_per_forward']:
                loss, model_out, review = self._loss_and_review(
                    model, example, self._loss_weight_arrays())
        return loss, example, model_out, review

    def log_error_state(self, data_dict, folder='log', file=sys.stdout):
        """Dump debugging state to ``storage_dir/log/error_state_*.ptt``.

        Reference parity: ``trainer.py:640``; unserializable values degrade
        to their repr.
        """
        def degrade(obj):
            try:
                dump_state(obj, Path('/dev/null'))
                return obj
            except Exception:
                pass
            if isinstance(obj, dict):
                return {k: degrade(v) for k, v in obj.items()}
            if isinstance(obj, (list, tuple)):
                return [degrade(v) for v in obj]
            try:
                return np.asarray(obj)
            except Exception:
                return repr(obj)

        from padertorch_tpu.parallel import multihost
        suffix = (f'_p{multihost.process_index()}'
                  if multihost.process_count() > 1 else '')
        written = []
        for k, v in data_dict.items():
            p = (self.storage_dir / folder
                 / f'error_state_{k}{suffix}{CKPT_EXT}')
            p.parent.mkdir(exist_ok=True, parents=True)
            try:
                dump_state(degrade(v), p)
                written.append(k)
            except Exception as e:
                log_file = self.storage_dir / folder / f'{k}.log'
                log_file.write_text(f'{type(e)}: {e}')
                print(f'Cannot save {k}. {type(e)}: {e}. See {log_file}',
                      file=file)
        written = ','.join(written)
        return str(
            self.storage_dir / folder / f'error_state_{{{written}}}{CKPT_EXT}')

    # ------------------------------------------------------------------ #
    # hooks registration                                                  #
    # ------------------------------------------------------------------ #
    def register_hook(self, hook):
        if isinstance(hook, (tuple, list)):
            for h in hook:
                self.register_hook(h)
        else:
            self.hooks.append(hook)

    def register_validation_hook(
            self, validation_iterator, metric='loss', maximize=False,
            max_checkpoints=1, n_back_off=0, lr_update_factor=1 / 10,
            back_off_patience=None, early_stopping_patience=None,
    ):
        """Reference parity: ``trainer.py:699``."""
        self.register_hook(BackOffValidationHook(
            trigger=self._checkpoint_trigger,
            iterator=validation_iterator,
            metric=metric,
            maximize=maximize,
            max_checkpoints=max_checkpoints,
            n_back_off=n_back_off,
            lr_update_factor=lr_update_factor,
            back_off_patience=back_off_patience,
            early_stopping_patience=early_stopping_patience,
        ))

    # ------------------------------------------------------------------ #
    # checkpointing                                                       #
    # ------------------------------------------------------------------ #
    @property
    def checkpoint_dir(self):
        return self.storage_dir / 'checkpoints'

    @property
    def ckpt_ext(self):
        """'.ptt' (npz+json zip) or '.orbax' (sharded directory)."""
        return CKPT_EXT if self.checkpoint_format == 'ptt' \
            else '.orbax'

    def default_checkpoint_path(self) -> Path:
        return (self.checkpoint_dir
                / f'ckpt_{self.iteration}{self.ckpt_ext}')

    def state_dict(self):
        if isinstance(self.optimizer, dict):
            optimizer_state = {
                k: o.state_dict() for k, o in self.optimizer.items()
            }
        else:
            optimizer_state = self.optimizer.state_dict()
        state = dict(
            model=ptmodule.state_dict(self.model),
            iteration=self.iteration,
            epoch=self.epoch,
            optimizer=optimizer_state,
            hooks=dict(),
        )
        for hook in self.hooks:
            hook_state = hook.state_dict()
            if hook_state is not None:
                assert hook.uid not in state['hooks'], (
                    hook.uid, state['hooks'].keys())
                state['hooks'][hook.uid] = hook_state
        return state

    def wait_for_checkpoint_writes(self):
        """Block until a pending async checkpoint write has committed.

        No-op for synchronous checkpointing.  Re-raises (once) an error
        from the writer thread so failures cannot pass silently.
        """
        writer = self._ckpt_writer
        if writer is not None:
            writer.join()
            self._ckpt_writer = None
        error = self._ckpt_writer_error
        if error is not None:
            self._ckpt_writer_error = None
            raise RuntimeError(
                'Asynchronous checkpoint write failed') from error

    def save_checkpoint(self, checkpoint_path=None):
        if checkpoint_path is None:
            checkpoint_path = self.default_checkpoint_path()
        checkpoint_path = Path(checkpoint_path)
        # at most ONE write in flight: serializes async saves and makes
        # file pruning/reading after this call race-free
        self.wait_for_checkpoint_writes()
        from padertorch_tpu.parallel import multihost
        if multihost.process_count() > 1:
            # multi-controller: fetch the state on ALL processes (the
            # all-gather of cross-process-sharded ZeRO/FSDP leaves is a
            # collective), then only process 0 writes; the barrier
            # guarantees the file is committed before any process
            # proceeds (a back-off reload may read it immediately).
            state = multihost.fetch_global(self.state_dict())
            if multihost.is_primary():
                self._write_checkpoint(state, checkpoint_path,
                                       self.iteration)
            multihost.barrier('save_checkpoint')
            return
        state = self.state_dict()
        if not self.async_checkpointing:
            self._write_checkpoint(state, checkpoint_path, self.iteration)
            return
        # Synchronous device->host snapshot before returning control:
        # the next jitted step DONATES parameter/optimizer buffers, so
        # the writer thread must never touch live device arrays.  The
        # tree_map also rebuilds every container, so later mutation of
        # hook state dicts cannot race the serialization.
        import jax
        state = jax.tree_util.tree_map(
            lambda x: np.asarray(x) if isinstance(x, jax.Array) else x,
            state)
        iteration = self.iteration

        def _write():
            try:
                self._write_checkpoint(state, checkpoint_path, iteration)
            except BaseException as e:  # surfaced on the next wait
                self._ckpt_writer_error = e

        import threading
        self._ckpt_writer = threading.Thread(
            target=_write, name='ckpt-writer', daemon=True)
        self._ckpt_writer.start()

    def _write_checkpoint(self, state, checkpoint_path, iteration):
        """Dump ``state`` and repoint ``ckpt_latest`` (atomic via the
        backends' tmp+rename; the symlink moves only after commit)."""
        if self.checkpoint_format == 'orbax':
            from padertorch_tpu.serialize import dump_state_orbax
            dump_state_orbax(state, checkpoint_path)
        else:
            dump_state(state, checkpoint_path)
        latest = (checkpoint_path.parent
                  / f'ckpt_latest{self.ckpt_ext}').absolute()
        if latest.is_symlink():
            latest.unlink()
        latest.symlink_to(checkpoint_path.name)
        print(f'Saved model and optimizer state at iteration '
              f'{iteration} to {checkpoint_path}')

    @staticmethod
    def _restore_shardings(old_tree, new_tree):
        """Re-place restored arrays with the pre-load shardings.

        Checkpoint restore yields host/single-device arrays; a sharded
        (DP/TP) trainer must put them back on the mesh or the resumed
        step would run single-device (and OOM at scale)."""
        import jax

        def place(old, new):
            if isinstance(old, jax.Array) and isinstance(
                    new, (jax.Array, np.ndarray)):
                return jax.device_put(new, old.sharding)
            return new

        return jax.tree_util.tree_map(place, old_tree, new_tree)

    def load_state_dict(self, state_dict):
        old_model = self.model
        self.model = ptmodule.load_state_dict(
            self.model, state_dict['model'])
        self.model = self._restore_shardings(old_model, self.model)
        if isinstance(self.optimizer, dict):
            assert set(self.optimizer.keys()) == set(
                state_dict['optimizer'].keys())
            for key, opt in self.optimizer.items():
                opt.load_state_dict(state_dict['optimizer'][key])
        else:
            self.optimizer.load_state_dict(state_dict['optimizer'])
        self.iteration = int(state_dict['iteration'])
        self.epoch = int(state_dict['epoch'])
        hook_states = dict(state_dict.get('hooks', {}))
        for hook in self.hooks:
            hook.set_last(self.iteration, self.epoch)
            if hook.uid in hook_states:
                hook.load_state_dict(hook_states.pop(hook.uid))
        assert len(hook_states) == 0, hook_states.keys()

    def load_checkpoint(self, map_location=None):
        del map_location
        self.wait_for_checkpoint_writes()
        from padertorch_tpu.parallel import multihost
        if multihost.process_count() > 1:
            # multi-controller resume: process 0 resolves + reads the
            # checkpoint, the state is broadcast as bytes (reference
            # analog: consider_mpi bcast, padertorch/base.py:152-165);
            # workers never touch the storage filesystem.
            if self.checkpoint_format != 'ptt':
                raise NotImplementedError(
                    'multi-process resume currently supports the ptt '
                    'checkpoint format')
            path = None
            if multihost.is_primary():
                path = self._resolve_checkpoint_path()
            path = multihost.broadcast_obj(path)
            # reads on process 0 only; workers receive the bytes
            state = multihost.load_state_broadcast(path)
            self.load_state_dict(state)
            print(f'Loaded checkpoint {str(path)!r} '
                  f'(iteration {self.iteration}, '
                  f'process {multihost.process_index()})')
            return
        checkpoint_path = self._resolve_checkpoint_path()
        if self.checkpoint_format == 'orbax':
            from padertorch_tpu.serialize import load_state_orbax
            self.load_state_dict(load_state_orbax(checkpoint_path))
        else:
            self.load_state_dict(load_state(checkpoint_path))
        print(f'Loaded checkpoint {checkpoint_path!r} '
              f'(iteration {self.iteration})')

    def _resolve_checkpoint_path(self):
        """Find the checkpoint to resume from (ckpt_latest, with a
        fallback to the newest ckpt_<it> on a dangling symlink)."""
        # clean up partial writes of an interrupted save (tmp+rename
        # means a *.tmp* path is by definition incomplete); orbax tmp
        # writes are DIRECTORIES
        import shutil
        for orphan in self.checkpoint_dir.glob('*.tmp*'):
            print(f'Removing incomplete checkpoint write {orphan}')
            if orphan.is_dir():
                shutil.rmtree(orphan, ignore_errors=True)
            else:
                orphan.unlink(missing_ok=True)
        checkpoint_path = (self.checkpoint_dir
                           / f'ckpt_latest{self.ckpt_ext}')
        if not checkpoint_path.exists():
            # dangling symlink (crash after pruning, before the new
            # save finished): fall back to the newest real checkpoint
            import re
            candidates = sorted(
                (p for p in self.checkpoint_dir.glob(
                    f'ckpt_*{self.ckpt_ext}')
                 if re.fullmatch(r'ckpt_\d+' + re.escape(self.ckpt_ext),
                                 p.name) and p.exists()),
                key=lambda p: int(re.findall(r'\d+', p.name)[0]))
            assert candidates, (
                f'No checkpoint found in {self.checkpoint_dir} '
                f'(ckpt_latest missing/dangling and no ckpt_<it> files)')
            checkpoint_path = candidates[-1]
            print(f'WARNING: ckpt_latest{self.ckpt_ext} is missing or '
                  f'dangling; resuming from {checkpoint_path.name}')
        return checkpoint_path

    # -- device parity (no-ops: XLA owns placement) ------------------------
    def to(self, device):
        return self

    def cpu(self):
        return self

    def cuda(self, device=None):
        return self

    # ------------------------------------------------------------------ #
    def test_run(
            self,
            train_iterator,
            validation_iterator,
            device=None,
            *,
            test_with_known_iterator_length=False,
            temporary_directory=None,
            deterministic_atol=1e-5,
            deterministic_rtol=1e-5,
            loss_atol=1e-6,
            loss_rtol=1e-6,
            virtual_minibatch_size=None,
    ):
        """Burn test: see ``padertorch_tpu.train.runtime_tests.test_run``."""
        from padertorch_tpu.train.runtime_tests import test_run
        test_run(
            self,
            train_iterator,
            validation_iterator,
            device=device,
            test_with_known_iterator_length=test_with_known_iterator_length,
            temporary_directory=temporary_directory,
            deterministic_atol=deterministic_atol,
            deterministic_rtol=deterministic_rtol,
            loss_atol=loss_atol,
            loss_rtol=loss_rtol,
            virtual_minibatch_size=virtual_minibatch_size,
        )


class MultiDeviceTrainer(Trainer):
    """API parity with reference ``trainer.py:921``.

    The torch version exists because a model spread over devices needs its
    losses gathered manually; under XLA+GSPMD device placement is expressed
    through shardings, so this is the plain Trainer with a sharding slot —
    kept as a named class so reference configs resolve.
    """

    def to(self, device):
        return self


class _NullWriter:
    """No-op summary writer for non-primary processes (multi-controller
    runs write tfevents from process 0 only)."""

    def __getattr__(self, name):
        if name.startswith('add_') or name in ('close', 'flush'):
            return lambda *args, **kwargs: None
        raise AttributeError(name)


class InteractiveWriter:
    """Summary writer that prints scalars instead of writing event files.

    Reference parity: ``trainer.py:1083``; doubles as a null writer in
    tests.
    """

    def __init__(self, *args, **kwargs):
        pass

    def add_scalar(self, tag, value, step):
        print(f'[{step}] {tag}: {value}')

    def __getattr__(self, name):
        if name.startswith('add_') or name in ('close', 'flush'):
            return lambda *args, **kwargs: None
        raise AttributeError(name)


class InteractiveTrainer(Trainer):
    """Trainer for notebook use: prints scalars instead of tensorboard.

    Reference parity: ``trainer.py:1048``.
    """

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.writer_cls = InteractiveWriter
