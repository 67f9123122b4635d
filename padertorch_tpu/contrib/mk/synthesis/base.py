"""Synthesis base class. Reference parity: ``contrib/mk/synthesis/base.py:10``."""
from padertorch_tpu.base import Module

__all__ = ['Synthesis']


class Synthesis(Module):
    """Base for modules that map feature representations to waveforms.

    Subclasses implement ``__call__(features, sequence_lengths=None)``
    returning time signals.
    """

    sampling_rate: int = None

    def forward(self, *args, **kwargs):
        raise NotImplementedError
