"""Persistent-VMEM WaveNet sampler vs the lax.scan sampler.

Interpret mode on CPU: greedy indices must match the scan sampler
exactly and teacher-forced logits to float tolerance.  Stochastic
sampling needs the TPU on-core PRNG and must raise cleanly on CPU.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from padertorch_tpu import random as ptrandom
from padertorch_tpu.modules.wavenet.wavenet import WaveNet


@pytest.fixture(scope='module')
def wavenet():
    ptrandom.seed(0)
    return WaveNet(
        n_cond_channels=20, upsamp_window=4, upsamp_stride=2,
        n_layers=4, max_dilation=4, n_residual_channels=16,
        n_skip_channels=32, n_out_channels=256)


@pytest.fixture(scope='module')
def cond(wavenet):
    rng = np.random.RandomState(0)
    return jnp.asarray(rng.randn(2, 4, 32, 24).astype('float32'))


def test_greedy_matches_scan_exactly(wavenet, cond):
    idx_scan = wavenet.sample(cond, key=jax.random.PRNGKey(0),
                              sample=False)
    idx_pal = wavenet.sample_pallas(cond, sample=False)
    np.testing.assert_array_equal(np.asarray(idx_pal),
                                  np.asarray(idx_scan))


def test_teacher_forced_logits_match(wavenet, cond):
    rng = np.random.RandomState(1)
    forced = jnp.asarray(rng.randint(0, 256, (2, 24)), jnp.int32)
    _, lg_scan = wavenet.sample(
        cond, key=jax.random.PRNGKey(0), sample=False,
        forced_input=forced, return_logits=True)
    _, lg_pal = wavenet.sample_pallas(
        cond, sample=False, forced_input=forced, return_logits=True)
    np.testing.assert_allclose(np.asarray(lg_pal),
                               np.asarray(lg_scan), atol=2e-5)


def test_stochastic_needs_tpu(wavenet, cond):
    if jax.default_backend() == 'tpu':  # pragma: no cover
        idx = wavenet.sample_pallas(cond, sample=True, seed=3)
        assert idx.shape == (2, 24)
        return
    with pytest.raises(NotImplementedError, match='PRNG'):
        wavenet.sample_pallas(cond, sample=True, seed=3)


def test_infer_uses_pallas_only_on_tpu(wavenet):
    """On CPU, infer must keep the scan path (interpret would be slow
    and stochastic sampling unsupported)."""
    rng = np.random.RandomState(2)
    feats = jnp.asarray(rng.randn(1, 20, 12).astype('float32'))
    audio = wavenet.infer(feats, key=jax.random.PRNGKey(0))
    assert audio.ndim == 2 and np.isfinite(np.asarray(audio)).all()


def test_uniform_from_bits_handles_signed_int32():
    """Regression: the sampler's PRNG bits are SIGNED int32; the old
    `bits >> 8` arithmetic shift produced NEGATIVE uniforms for half
    the draws (log -> NaN -> Gumbel argmax garbage).  The helper must
    map any int32 pattern to [0, 1) and stay uniform."""
    import numpy as np
    import jax.numpy as jnp
    from padertorch_tpu.ops.pallas.wavenet import _uniform_from_bits

    rng = np.random.RandomState(0)
    bits = jnp.asarray(
        rng.randint(-2**31, 2**31, size=100_000, dtype=np.int64)
        .astype(np.int32))
    u = np.asarray(_uniform_from_bits(bits))
    assert u.min() >= 0.0 and u.max() < 1.0, (u.min(), u.max())
    # uniformity: mean ~0.5, each decile populated
    assert abs(u.mean() - 0.5) < 0.01, u.mean()
    hist, _ = np.histogram(u, bins=10, range=(0, 1))
    assert hist.min() > 8000, hist
    # extreme patterns
    for pattern in (-2**31, -1, 0, 2**31 - 1):
        v = float(_uniform_from_bits(jnp.asarray([pattern], jnp.int32))[0])
        assert 0.0 <= v < 1.0, (pattern, v)
