"""Reference-layout re-export: the PIT model is a core model family here."""
from padertorch_tpu.models.bss import PermutationInvariantTrainingModel

__all__ = ['PermutationInvariantTrainingModel']
