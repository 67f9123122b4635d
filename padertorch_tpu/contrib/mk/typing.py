"""Common type aliases.

Reference parity: ``padertorch/contrib/mk/typing.py`` (torch Tensor →
jax Array).
"""
from pathlib import Path
import typing as tp

import jax

TPath = tp.Union[str, Path]
TSeqLen = tp.Optional[tp.List[int]]
TActivationFn = tp.Union[str, tp.Callable]
TSeqReturn = tp.Tuple[jax.Array, TSeqLen]
TDevice = tp.Union[str, int, tp.Sequence[int]]

__all__ = ['TPath', 'TSeqLen', 'TActivationFn', 'TSeqReturn', 'TDevice']
