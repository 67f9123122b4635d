"""WaveNet tests: the scan sampler must exactly reproduce the training
graph under teacher forcing (the correctness contract the reference's CUDA
engine also had to meet), plus shape/chunking checks."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from padertorch_tpu import random as ptrandom
from padertorch_tpu.modules.wavenet import WaveNet


def small_wavenet():
    ptrandom.seed(0)
    return WaveNet(
        n_cond_channels=8,
        upsamp_window=16,
        upsamp_stride=8,
        n_layers=4,
        max_dilation=4,
        n_residual_channels=8,
        n_skip_channels=16,
        n_out_channels=256,
    ).eval()


def test_forward_shapes():
    net = small_wavenet()
    b, frames = 2, 12
    t = 12 * 8 - 8  # frames*stride - (window - stride) with 'full' fading
    features = jnp.asarray(
        np.random.RandomState(0).randn(b, 8, frames), 'float32')
    audio = jnp.asarray(np.clip(
        np.random.RandomState(1).randn(b, t) * 0.2, -1, 1), 'float32')
    logits, quantized = net(features, audio)
    assert logits.shape == (b, 256, t)
    assert quantized.shape == (b, t)
    assert quantized.dtype == jnp.int32
    # first position is zeroed (no information about sample 0)
    np.testing.assert_array_equal(np.asarray(logits[:, :, 0]), 0.0)


def test_sampler_matches_training_graph_teacher_forced():
    """Scan sampler logits == conv training graph logits (teacher forced)."""
    net = small_wavenet()
    b, frames = 1, 10
    t = frames * 8 - 8
    rng = np.random.RandomState(0)
    features = jnp.asarray(rng.randn(b, 8, frames), 'float32')
    audio = jnp.asarray(
        np.clip(rng.randn(b, t) * 0.2, -1, 1), 'float32')
    logits, quantized = net(features, audio)

    cond = net.get_cond_input(features)[..., :t]
    cond = cond.reshape(b, net.n_layers, -1, t)
    # position t's prediction uses sample t-1 as input
    forced_prev = jnp.concatenate(
        [jnp.full((b, 1), 128, jnp.int32), quantized[:, :-1]], axis=1)
    _, sampler_logits = net.sample(
        cond, forced_input=forced_prev, sample=False, return_logits=True)
    # compare from t=1 (training graph zeroes position 0)
    np.testing.assert_allclose(
        np.asarray(sampler_logits[:, :, 1:]),
        np.asarray(logits[:, :, 1:]),
        atol=1e-4,
    )


def test_infer_shapes_and_chunking():
    net = small_wavenet()
    b, frames = 1, 20
    features = jnp.asarray(
        np.random.RandomState(0).randn(b, 8, frames), 'float32')
    t = 8 * frames - 8
    audio_full = net.infer(features, key=jax.random.PRNGKey(0))
    assert audio_full.shape == (b, t)
    assert float(jnp.max(jnp.abs(audio_full))) <= 1.0
    audio_chunked = net.infer(
        features, chunk_length=64, chunk_overlap=16,
        key=jax.random.PRNGKey(0))
    assert audio_chunked.shape[0] == b
    # chunked output covers the full length (overlap trimmed)
    assert audio_chunked.shape[-1] == t


def test_training_step_with_loss():
    from padertorch_tpu.module import partition, combine
    from padertorch_tpu.ops.losses.classification import (
        softmax_cross_entropy)
    net = small_wavenet().train()
    b, frames = 2, 8
    t = frames * 8 - 8
    rng = np.random.RandomState(0)
    features = jnp.asarray(rng.randn(b, 8, frames), 'float32')
    audio = jnp.asarray(np.clip(rng.randn(b, t) * 0.2, -1, 1), 'float32')
    params, static = partition(net)

    def loss_fn(p):
        logits, quantized = combine(p, static)(features, audio)
        return softmax_cross_entropy(
            jnp.swapaxes(logits, 1, 2), quantized)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    total = sum(float(jnp.sum(jnp.abs(g)))
                for g in jax.tree_util.tree_leaves(grads))
    assert total > 0


def test_parallel_chunked_infer_matches_shapes():
    net = small_wavenet()
    b, frames = 1, 40
    features = jnp.asarray(
        np.random.RandomState(0).randn(b, 8, frames), 'float32')
    t = 8 * frames - 8
    seq = net.infer(features, chunk_length=64, chunk_overlap=16,
                    key=jax.random.PRNGKey(0))
    par = net.infer(features, chunk_length=64, chunk_overlap=16,
                    key=jax.random.PRNGKey(0), parallel=True)
    assert seq.shape == par.shape == (b, t)
    assert float(jnp.max(jnp.abs(par))) <= 1.0


def test_infer_parallel_greedy_matches_sequential():
    # greedy (sample=False) chunked synthesis is deterministic and the
    # chunks see identical conditioning + zero warm-up context in both
    # modes, so the gather-based parallel reassembly must match the
    # sequential chunk loop exactly
    import jax
    import jax.numpy as jnp
    import numpy as np
    net = small_wavenet()
    features = jnp.asarray(
        np.random.RandomState(1).randn(1, 8, 40), 'float32')
    seq = net.infer(features, chunk_length=64, chunk_overlap=16,
                    key=jax.random.PRNGKey(0), sample=False)
    par = net.infer(features, chunk_length=64, chunk_overlap=16,
                    key=jax.random.PRNGKey(0), sample=False,
                    parallel=True)
    np.testing.assert_allclose(np.asarray(seq), np.asarray(par),
                               atol=1e-6)


def test_non_overlapping_upsampler_keeps_frames():
    """Regression: upsamp_window == upsamp_stride has NO fading region;
    the crop used to slice [0:-0] — an EMPTY tensor — and crash the
    conditioning convs for this common non-overlapping vocoder
    config."""
    from padertorch_tpu import random as ptrandom
    from padertorch_tpu.modules.wavenet.wavenet import WaveNet

    ptrandom.seed(0)
    wn = WaveNet(n_cond_channels=8, upsamp_window=128, upsamp_stride=128,
                 n_in_channels=32, n_layers=2, max_dilation=2,
                 n_residual_channels=8, n_skip_channels=16,
                 n_out_channels=32)
    feats = jnp.asarray(
        np.random.RandomState(0).randn(2, 8, 10), 'float32')
    cond = wn.get_cond_input(feats)
    assert cond.shape[-1] == 10 * 128, cond.shape
