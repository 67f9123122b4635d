from padertorch_tpu.native.dataprep import (
    NATIVE_AVAILABLE, pcm16_to_float32, mu_law_encode, mu_law_decode,
    frame_signal,
)
