"""Pallas kernel tests (interpret mode on CPU) against the jnp oracle."""
import numpy as np
import pytest

import jax.numpy as jnp

from padertorch_tpu.ops._stft import STFT
from padertorch_tpu.contrib.je.modules.features import get_fbanks
from padertorch_tpu.ops.pallas.logmel import LogMelFrontend


@pytest.mark.parametrize('size,shift,wl', [(512, 128, 512), (256, 64, 128)])
def test_fused_logmel_matches_jnp_oracle(size, shift, wl):
    rng = np.random.RandomState(0)
    x = rng.randn(2, 4000).astype('float32')

    frontend = LogMelFrontend(
        sample_rate=16000, size=size, shift=shift, window_length=wl,
        n_mels=40, interpret=True)
    got = np.asarray(frontend(jnp.asarray(x)))

    # jnp oracle: STFT -> power -> mel matmul -> log
    stft = STFT(size, shift, window_length=wl, fading='full',
                complex_representation='complex', dtype='float32')
    spec = np.asarray(stft(x))
    power = np.abs(spec) ** 2
    fb = get_fbanks(16000, size, 40).astype('float32')
    fb = fb / (fb.sum(-1, keepdims=True) + 1e-6)
    want = np.log(power @ fb.T + 1e-12)

    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-4)


def test_fused_logmel_rejects_bad_hop():
    with pytest.raises(AssertionError, match='shift'):
        LogMelFrontend(size=512, shift=100)
