"""padertorch_tpu — a TPU-native speech training & inference framework.

A brand-new framework with the capabilities of fgnt/padertorch, built
idiomatically on JAX/XLA/Pallas/pjit. Import as::

    import padertorch_tpu as pt
"""
__version__ = '0.1.0'

from padertorch_tpu.configurable import Configurable
from padertorch_tpu import utils
from padertorch_tpu import io
