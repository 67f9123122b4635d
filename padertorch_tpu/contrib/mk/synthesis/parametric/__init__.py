"""Parametric (non-neural) synthesis — reference import-path parity for
``padertorch.contrib.mk.synthesis.parametric``."""
from padertorch_tpu.contrib.mk.synthesis.griffin_lim import (  # noqa: F401
    FGLA,
    GriffinLim,
    fast_griffin_lim,
    griffin_lim_step,
    reshape_complex,
)
