"""Diffusion vocoder data pipeline.

Shares the WaveNet vocoder's front end (1 s segments, log-mel
conditioning at hop 200 / window 800 / 80 mels) so all three vocoder
recipes (autoregressive WaveNet, GAN, diffusion) consume identical
features — see ``contrib/examples/audio_synthesis/wavenet/data.py``.
"""
from padertorch_tpu.contrib.examples.audio_synthesis.wavenet.data import (
    SAMPLE_RATE, STFT_SHIFT, STFT_WINDOW, STFT_SIZE, NUM_MELS,
    synthetic_database, extract_features, post_batch, prepare_dataset,
)

__all__ = [
    'SAMPLE_RATE', 'STFT_SHIFT', 'STFT_WINDOW', 'STFT_SIZE', 'NUM_MELS',
    'synthetic_database', 'extract_features', 'post_batch',
    'prepare_dataset',
]
