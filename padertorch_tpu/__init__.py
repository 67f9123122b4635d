"""padertorch_tpu — a TPU-native speech training & inference framework.

A brand-new framework with the capabilities of fgnt/padertorch, built
idiomatically on JAX/XLA/Pallas/pjit. Import as::

    import padertorch_tpu as pt
"""
__version__ = '0.1.0'

from padertorch_tpu.configurable import Configurable
from padertorch_tpu.module import Module, partition, combine
from padertorch_tpu.base import Model, pt_dataclass
from padertorch_tpu import utils
from padertorch_tpu import io
from padertorch_tpu import cli
from padertorch_tpu import serve
from padertorch_tpu import quantize
from padertorch_tpu import lora
from padertorch_tpu import random
from padertorch_tpu import nn
from padertorch_tpu import data
from padertorch_tpu import train
from padertorch_tpu.train import (
    Trainer, Optimizer, Adam, AdamW, SGD, Adadelta, Adafactor, Lion, Muon,
)
from padertorch_tpu import modules
from padertorch_tpu import migrate
from padertorch_tpu import ops
from padertorch_tpu import summary
from padertorch_tpu import models
from padertorch_tpu import parallel
from padertorch_tpu import evaluation
from padertorch_tpu.ops import mappings
# reference top-level surface (``pt.X`` works like in fgnt/padertorch)
from padertorch_tpu.ops import (
    STFT, einsum, move_axis, mu_law_encode, mu_law_decode,
    compute_mask,
)
from padertorch_tpu.ops.losses import (
    pit_loss, deep_clustering_loss, mse_loss, softmax_cross_entropy,
)
from padertorch_tpu.train.trainer import InteractiveTrainer
#: reference name for :func:`pt_dataclass` (there ``torch_dataclass``)
torch_dataclass = pt_dataclass
