from padertorch_tpu.summary.tbx_utils import (
    mask_to_image, stft_to_image, spectrogram_to_image, review_dict,
    audio, figure, figure_to_image,
)
from padertorch_tpu.summary.model_info import (
    num_parameters, ModelParameterSize,
)
from padertorch_tpu.summary.tfevents import (
    load_events_as_dict, scalars_from_events,
)
