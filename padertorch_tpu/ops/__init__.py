from padertorch_tpu.ops._stft import STFT, HostSTFT
from padertorch_tpu.ops.streaming import StreamingSTFT, StreamingISTFT
from padertorch_tpu.ops.einsum import einsum
from padertorch_tpu.ops.mu_law import mu_law_encode, mu_law_decode
from padertorch_tpu.ops.tensor import (
    move_axis, broadcast_to, matrix_diag, matrix_eye_like, batch_tril,
)
from padertorch_tpu.ops.mappings import ACTIVATION_FN_MAP
from padertorch_tpu.ops import losses
from padertorch_tpu.ops import sequence
from padertorch_tpu.ops.sequence.mask import compute_mask
from padertorch_tpu.ops.sequence.pack_module import (
    pad_sequence, pack_sequence, unpack_sequence,
)
from padertorch_tpu.ops.sequence.reduction import (
    sequence_reduction, masked_mean, masked_sum,
)
from padertorch_tpu.ops.losses import (
    mse_loss, log_mse_loss, sdr_loss, si_sdr_loss, log1p_mse_loss,
    source_aggregated_sdr_loss, deep_clustering_loss, pit_loss,
    compute_pairwise_losses, pit_loss_from_loss_matrix,
    softmax_cross_entropy, gaussian_kl_divergence,
    spectral_convergence_loss, log_stft_magnitude_loss,
    stft_magnitude_loss, multi_resolution_stft_loss,
)
