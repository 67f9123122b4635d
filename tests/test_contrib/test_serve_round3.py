"""Serving exports of the round-3 models (torch-free: these tests
exercise the pure-JAX StableHLO path and must run on JAX-only CI)."""
import numpy as np

from padertorch_tpu import random as ptrandom
from padertorch_tpu.serve import export_model, load_exported


def test_bigvgan_generator_serves_via_stablehlo_export():
    from padertorch_tpu.contrib.mk.synthesis.vocoder.bigvgan import (
        BigVGANGenerator)
    ptrandom.seed(0)
    g = BigVGANGenerator(
        num_mels=4, upsample_rates=(2, 2), upsample_kernel_sizes=(4, 4),
        upsample_initial_channel=8, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1,),)).eval()
    mel = np.zeros((2, 4, 6), np.float32)
    want = np.asarray(g(mel))
    blob = export_model(g, mel, polymorphic_batch=True)
    served = load_exported(blob)
    np.testing.assert_allclose(
        np.asarray(served(mel)), want, rtol=1e-5, atol=1e-6)
    # polymorphic batch: a different batch size works on the same blob
    mel3 = np.zeros((3, 4, 6), np.float32)
    assert np.asarray(served(mel3)).shape == (3, 1, 24)


def test_wav2vec2_serves_via_stablehlo_export():
    from padertorch_tpu.contrib.mk.modules.features.wav2vec2 import (
        Wav2Vec2Model)
    ptrandom.seed(0)
    m = Wav2Vec2Model(
        conv_dim=(8, 8), conv_kernel=(10, 3), conv_stride=(5, 2),
        d_model=16, num_layers=2, num_heads=2, d_ff=32).eval()
    audio = np.zeros((2, 400), np.float32)
    want = np.asarray(m(audio)[0])
    blob = export_model(m, audio, polymorphic_batch=True)
    served = load_exported(blob)
    np.testing.assert_allclose(
        np.asarray(served(audio)[0]), want, rtol=1e-5, atol=1e-6)
    assert np.asarray(served(np.zeros((5, 400), np.float32))[0]
                      ).shape[0] == 5
