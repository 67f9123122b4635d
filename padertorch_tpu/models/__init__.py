from padertorch_tpu.models import bss
from padertorch_tpu.models import tasnet
from padertorch_tpu.models.bss import (
    PermutationInvariantTrainingModel, DeepClusteringModel,
)
from padertorch_tpu.models.tasnet import TasNet
