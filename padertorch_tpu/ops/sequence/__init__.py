from padertorch_tpu.ops.sequence.mask import compute_mask
from padertorch_tpu.ops.sequence.reduction import (
    sequence_reduction, masked_mean, masked_sum,
)
