"""Module/Model base classes — the user-facing core abstraction.

Reference parity: ``padertorch/base.py:55,228``.  A user implements
``forward(inputs)`` and ``review(inputs, outputs)``; the framework owns the
loop.  TPU-native design: ``forward`` + ``review`` are pure functions of the
module pytree and compile into a single XLA train step
(``loss, summary = review(example, forward(example))`` under
``jax.value_and_grad``) — see ``padertorch_tpu/train/trainer.py``.
"""
import dataclasses
from pathlib import Path

from padertorch_tpu.module import Module, load_state_dict
from padertorch_tpu.utils.nested import get_by_path

__all__ = ['Module', 'Model', 'pt_dataclass']


ALLOWED_REVIEW_KEYS = (
    'loss',
    'losses',
    'scalars',
    'histograms',
    'audios',
    'images',
    'texts',
    'figures',
    'buffers',
    'snapshots',
)


class Model(Module):
    """Abstract base for trainable models.

    Subclasses implement:

    - ``forward(inputs) -> outputs``: the network. Pure and jit-safe.
    - ``review(inputs, outputs) -> dict``: loss and report. Pure and
      jit-safe; allowed keys (reference ``base.py:254-318``):

      - ``loss``: scalar array — the training objective, or
      - ``losses``: dict of named scalar losses (weighted by the trainer's
        ``loss_weights``),
      - ``scalars``: dict name -> scalar/array (aggregated as means),
      - ``histograms``: dict name -> array of values,
      - ``audios``: dict name -> (signal, sample_rate) or signal,
      - ``images``: dict name -> image array [*, H, W] in [0, 1],
      - ``texts``: dict name -> str,
      - ``figures``: dict name -> matplotlib figure (only when not jitted),
      - ``buffers``: dict name -> array, concatenated across steps for
        custom aggregation in ``modify_summary``,
      - ``snapshots``: dict name -> array, keep-last (only computed when
        ``self.create_snapshot`` is True).

    Under jit, ``scalars``/``histograms``/``audios``/``images``/``buffers``
    must be arrays (device outputs fetched asynchronously by the summary
    hook); ``texts``/``figures`` require the non-jitted path.
    """

    # When False, models should skip expensive snapshot computation; the
    # SummaryHook flips this so snapshots are only built when they will be
    # written to the event file (reference ``base.py:235``).
    create_snapshot = False

    def forward(self, inputs):
        raise NotImplementedError

    def review(self, inputs, outputs) -> dict:
        """Compute loss and report from inputs and ``forward`` outputs."""
        raise NotImplementedError

    def modify_summary(self, summary: dict) -> dict:
        """Post-process an aggregated summary (host-side, not jitted).

        Called by the summary hook just before writing, e.g. to compute an
        accuracy from buffered labels.  Implementations must drain
        ``summary['buffers']`` and convert ``summary['snapshots']`` they
        consume.  The default reduces scalar lists to their mean
        (reference ``base.py:320-358``).
        """
        import numpy as np
        for key, scalar in summary['scalars'].items():
            summary['scalars'][key] = np.mean(np.asarray(scalar))
        assert len(summary['buffers']) == 0, (
            'intermediate format buffers has to be converted during '
            'modify_summary')
        assert len(summary['snapshots']) == 0, (
            'intermediate format snapshots has to be converted during '
            'modify_summary')
        return summary

    def example_to_device(self, example, device=None):
        """Move a (nested) numpy example to a device.

        Reference parity: ``base.py:360``. On TPU this is the host->HBM
        transfer boundary; the trainer's prefetcher usually calls it ahead
        of time (double buffering).
        """
        from padertorch_tpu.data.batch import example_to_device
        return example_to_device(example, device)

    # -- checkpoint loading --------------------------------------------------
    def load_checkpoint(
            self,
            checkpoint_path,
            in_checkpoint_path='model',
            consider_mpi=False,
    ):
        """Return a copy of self with parameters from a checkpoint file.

        Functional twist on reference ``base.py:123``: returns the loaded
        module instead of mutating (pytrees are immutable under jit).

        ``consider_mpi=True`` (reference parity: ``base.py:152-165``):
        in a ``jax.distributed`` run, process 0 reads the checkpoint and
        the bytes are broadcast to all processes.
        """
        from padertorch_tpu.serialize import load_state
        if consider_mpi:
            from padertorch_tpu.parallel import multihost
            if multihost.process_count() > 1:
                state = multihost.load_state_broadcast(checkpoint_path)
                if in_checkpoint_path:
                    state = get_by_path(state, in_checkpoint_path)
                return load_state_dict(self, state)
        state = load_state(checkpoint_path)
        if in_checkpoint_path:
            state = get_by_path(state, in_checkpoint_path)
        return load_state_dict(self, state)

    @classmethod
    def from_config_and_checkpoint(
            cls,
            config_path,
            checkpoint_path,
            in_config_path='trainer.model',
            in_checkpoint_path='model',
            consider_mpi=False,
    ):
        """Reference parity: ``base.py:75``."""
        model = cls.from_file(
            config_path, in_config_path, consider_mpi=consider_mpi)
        return model.load_checkpoint(
            checkpoint_path, in_checkpoint_path, consider_mpi=consider_mpi)

    @classmethod
    def from_storage_dir(
            cls,
            storage_dir,
            config_name='config.json',
            checkpoint_name='ckpt_best_loss.ptt',
            in_config_path='trainer.model',
            in_checkpoint_path='model',
            consider_mpi=False,
    ):
        """Load the model of a finished training. Reference: ``base.py:183``."""
        storage_dir = Path(storage_dir)
        return cls.from_config_and_checkpoint(
            config_path=storage_dir / config_name,
            checkpoint_path=storage_dir / 'checkpoints' / checkpoint_name,
            in_config_path=in_config_path,
            in_checkpoint_path=in_checkpoint_path,
            consider_mpi=consider_mpi,
        )


def pt_dataclass(cls):
    """Dataclass decorator for structured examples/outputs.

    TPU-native analog of reference ``torch_dataclass`` (``base.py:408``):
    the resulting dataclass moves through ``example_to_device``/``collate``
    (which handle dataclasses) and is jax-pytree-registered so it can cross
    the jit boundary.
    """
    import jax
    cls = dataclasses.dataclass(cls)
    fields = [f.name for f in dataclasses.fields(cls)]

    def flatten(obj):
        return tuple(getattr(obj, f) for f in fields), None

    def flatten_with_keys(obj):
        return tuple(
            (jax.tree_util.GetAttrKey(f), getattr(obj, f)) for f in fields
        ), None

    def unflatten(aux, children):
        del aux
        return cls(*children)

    jax.tree_util.register_pytree_with_keys(
        cls, flatten_with_keys, unflatten, flatten_func=flatten)
    return cls
