// Native host-side data-preparation kernels for the input pipeline.
//
// The reference framework's native code (nv_wavenet CUDA, BigVGAN CUDA)
// accelerates the GPU compute path; on TPU the device compute path is
// XLA/Pallas, and the native-code need moves to the *host*: the prefetch
// threads decode/convert/frame audio while the chip trains.  These
// kernels replace the numpy equivalents in
// padertorch_tpu/contrib/je/data/transforms.py and data/segment.py hot
// loops; they release the GIL (called via ctypes) so all prefetch
// threads convert in parallel.
//
// Build: cc -O3 -march=native -shared -fPIC _dataprep.cpp -o _dataprep.so
// (done automatically on first import by dataprep.py).

#include <cstdint>
#include <cstring>
#include <cmath>

extern "C" {

// int16 PCM -> float32 in [-1, 1]
void pcm16_to_float32(const int16_t* in, float* out, int64_t n) {
    const float scale = 1.0f / 32768.0f;
    for (int64_t i = 0; i < n; ++i) {
        out[i] = in[i] * scale;
    }
}

// mu-law encode float32 in [-1, 1] -> uint8 indices (mu = 255).
// Matches padertorch_tpu.ops.mu_law.mu_law_encode.
void mu_law_encode_f32(const float* in, uint8_t* out, int64_t n,
                       int32_t mu_quantization) {
    const float mu = (float)(mu_quantization - 1);
    const float scaling = logf(1.0f + mu);
    for (int64_t i = 0; i < n; ++i) {
        float x = in[i];
        float sign = x < 0.0f ? -1.0f : 1.0f;
        float x_mu = sign * logf(1.0f + mu * fabsf(x)) / scaling;
        float enc = (x_mu + 1.0f) * 0.5f * mu + 0.5f;
        out[i] = (uint8_t)enc;
    }
}

// mu-law decode uint8 indices -> float32 in [-1, 1].
void mu_law_decode_u8(const uint8_t* in, float* out, int64_t n,
                      int32_t mu_quantization) {
    const float mu = (float)(mu_quantization - 1);
    for (int64_t i = 0; i < n; ++i) {
        float signal = 2.0f * (in[i] / mu) - 1.0f;
        float sign = signal < 0.0f ? -1.0f : 1.0f;
        float magnitude =
            (1.0f / mu) * (powf(1.0f + mu, fabsf(signal)) - 1.0f);
        out[i] = sign * magnitude;
    }
}

// Frame a 1-D signal into overlapping windows: out[(n_frames, length)].
void frame_signal_f32(const float* in, float* out, int64_t n_frames,
                      int64_t length, int64_t shift) {
    for (int64_t f = 0; f < n_frames; ++f) {
        std::memcpy(out + f * length, in + f * shift,
                    length * sizeof(float));
    }
}

// Zero-pad + stack variable-length float32 rows into a dense batch.
// lengths: per-row valid lengths; out is (n_rows, max_len), pre-zeroed by
// the caller or overwritten fully here.
void pad_stack_f32(const float* const* rows, const int64_t* lengths,
                   float* out, int64_t n_rows, int64_t max_len) {
    for (int64_t r = 0; r < n_rows; ++r) {
        std::memcpy(out + r * max_len, rows[r],
                    lengths[r] * sizeof(float));
        std::memset(out + r * max_len + lengths[r], 0,
                    (max_len - lengths[r]) * sizeof(float));
    }
}

}  // extern "C"
