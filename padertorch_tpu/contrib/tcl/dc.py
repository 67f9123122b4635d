"""Deep clustering model. Reference parity: ``padertorch/contrib/tcl/dc.py``.

The model itself lives in ``padertorch_tpu.models.bss`` (it is a core
model family in this framework); re-exported here for reference-layout
parity.
"""
from padertorch_tpu.models.bss import DeepClusteringModel

__all__ = ['DeepClusteringModel']
