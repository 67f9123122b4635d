"""Stochastic weight averaging hook. Reference parity: ``contrib/je/hooks/swa.py:5``."""
import jax
import numpy as np

from padertorch_tpu.train.hooks import TriggeredHook
from padertorch_tpu import module as ptmodule

__all__ = ['SWAHook']


class SWAHook(TriggeredHook):
    """Maintains the running average of model parameters between
    ``swa_start`` and the end of training; ``swa_model()`` returns a model
    with the averaged parameters.
    """

    def __init__(self, trigger, swa_start=0):
        super().__init__(trigger)
        self.swa_start = swa_start
        self._sum = None
        self._count = 0

    def post_optimize(self, trainer, summary):
        del summary
        if trainer.iteration < self.swa_start:
            return
        if self.trigger(trainer.iteration, trainer.epoch):
            params, _ = ptmodule.partition(trainer.model)
            leaves = jax.tree_util.tree_leaves(params)
            if self._sum is None:
                self._sum = [np.asarray(x, dtype='float64') for x in leaves]
            else:
                for i, x in enumerate(leaves):
                    self._sum[i] = self._sum[i] + np.asarray(x)
            self._count += 1

    def state_dict(self):
        if self._sum is None:
            return {'count': 0}
        return {
            'count': self._count,
            'sums': {str(i): s for i, s in enumerate(self._sum)},
        }

    def load_state_dict(self, state_dict):
        self._count = int(state_dict['count'])
        if self._count and 'sums' in state_dict:
            sums = state_dict['sums']
            self._sum = [np.asarray(sums[str(i)])
                         for i in range(len(sums))]

    def swa_model(self, trainer):
        """Return a copy of the model with SWA-averaged parameters."""
        assert self._count > 0, 'No parameters accumulated yet.'
        params, static = ptmodule.partition(trainer.model)
        leaves, treedef = jax.tree_util.tree_flatten(params)
        averaged = [
            (s / self._count).astype(np.asarray(x).dtype)
            for s, x in zip(self._sum, leaves)
        ]
        avg_params = jax.tree_util.tree_unflatten(treedef, averaged)
        return ptmodule.combine(avg_params, static)
