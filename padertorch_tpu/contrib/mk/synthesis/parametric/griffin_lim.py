"""Reference import-path parity: the implementation lives in
``padertorch_tpu.contrib.mk.synthesis.griffin_lim``."""
from padertorch_tpu.contrib.mk.synthesis.griffin_lim import *  # noqa: F401,F403
from padertorch_tpu.contrib.mk.synthesis.griffin_lim import __all__  # noqa: F401
