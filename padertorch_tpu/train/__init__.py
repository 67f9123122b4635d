from padertorch_tpu.train import trigger
from padertorch_tpu.train import optimizer
from padertorch_tpu.train import hooks
from padertorch_tpu.train.trainer import Trainer, ContextTimerDict
from padertorch_tpu.train.precision import Precision
from padertorch_tpu.train.optimizer import (
    Optimizer, Adam, AdamW, SGD, Adadelta, Adafactor, Lion, Muon,
)
from padertorch_tpu.train.hooks import (
    SummaryHook, CheckpointHook, ValidationHook, BackOffValidationHook,
    LRSchedulerHook, ProgressBarHook, StopTrainingHook, StopTraining,
    AnnealingHook, LossWeightAnnealingHook, ModelAttributeAnnealingHook,
    LRAnnealingHook, EMAHook,
)
