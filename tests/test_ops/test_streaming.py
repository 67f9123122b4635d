"""Streaming STFT/iSTFT == offline transform, and an end-to-end
online (chunked, fixed-latency) enhancer == offline processing."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from padertorch_tpu.ops._stft import STFT
from padertorch_tpu.ops.streaming import StreamingSTFT, StreamingISTFT


def _signal(shape, seed=0):
    return jnp.asarray(
        np.random.RandomState(seed).randn(*shape).astype('float32'))


@pytest.mark.parametrize('size,shift,window_length', [
    (512, 128, None),
    (512, 160, None),   # overlap not a multiple of shift
    (512, 128, 400),    # window shorter than the FFT
    (256, 64, None),
])
@pytest.mark.parametrize('rep', ['complex', 'stacked', 'concat'])
def test_streaming_stft_equals_offline_full_fading(
        size, shift, window_length, rep):
    stft = STFT(size, shift, window_length=window_length,
                fading='full', complex_representation=rep)
    streamer = StreamingSTFT(stft)
    assert streamer.warmup_frames == 0
    x = _signal((2, 20 * shift))
    ref = stft(x)
    got = streamer.process(x, chunk_size=4 * shift)
    # equal up to XLA's conv reduction order (differs with length)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize('chunk_shifts', [1, 4, 5, 20])
def test_streaming_stft_chunk_size_invariance(chunk_shifts):
    stft = STFT(512, 128)
    streamer = StreamingSTFT(stft)
    x = _signal((3, 20 * 128))
    ref = stft(x)
    got = streamer.process(x, chunk_size=chunk_shifts * 128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_streaming_stft_no_fading_warmup_drop():
    stft = STFT(512, 128, fading=None)
    streamer = StreamingSTFT(stft)
    assert streamer.warmup_frames == 3  # (512 - 128) / 128
    x = _signal((2, 16 * 128))
    ref = stft(x)
    got = streamer.process(x, chunk_size=4 * 128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_streaming_stft_multidim_batch_and_jit():
    stft = STFT(512, 128)
    streamer = StreamingSTFT(stft)
    x = _signal((2, 3, 12 * 128))
    ref = stft(x)
    step = jax.jit(streamer.step)
    state = streamer.init_state((2, 3))
    outs = []
    for start in range(0, x.shape[-1], 512):
        state, frames = step(state, x[..., start:start + 512])
        outs.append(frames)
    outs.append(jax.jit(streamer.finalize)(state))
    got = jnp.concatenate(outs, axis=-2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_streaming_stft_rejects_bad_config():
    with pytest.raises(NotImplementedError):
        StreamingSTFT(STFT(512, 128, fading='half'))
    with pytest.raises(ValueError):
        # overlap 352 not a multiple of shift 160 -> no warmup alignment
        StreamingSTFT(STFT(512, 160, fading=None))
    streamer = StreamingSTFT(STFT(512, 128))
    state = streamer.init_state((1,))
    with pytest.raises(AssertionError):
        streamer.step(state, jnp.zeros((1, 100)))  # not a shift multiple


@pytest.mark.parametrize('size,shift', [(512, 128), (512, 160), (256, 64)])
@pytest.mark.parametrize('fading', ['full', None])
def test_streaming_istft_equals_offline(size, shift, fading):
    stft = STFT(size, shift, fading=fading)
    x = _signal((2, 20 * shift))
    frames = stft(x)
    ref = stft.inverse(frames)
    got = StreamingISTFT(stft).process(frames, chunk_frames=4)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_streaming_istft_single_frame_chunks():
    stft = STFT(512, 128)
    x = _signal((1, 12 * 128))
    frames = stft(x)
    ref = stft.inverse(frames)
    got = StreamingISTFT(stft).process(frames, chunk_frames=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_streaming_roundtrip_reconstructs_signal():
    stft = STFT(512, 128)
    streamer = StreamingSTFT(stft)
    synth = StreamingISTFT(stft)
    n = 24 * 128
    x = _signal((2, n))
    a_state = streamer.init_state((2,))
    s_state = synth.init_state((2,))
    outs = []
    for start in range(0, n, 512):
        a_state, frames = streamer.step(a_state, x[..., start:start + 512])
        s_state, samples = synth.step(s_state, frames)
        outs.append(samples)
    a_tail = streamer.finalize(a_state)
    s_state, samples = synth.step(s_state, a_tail)
    outs.append(samples)
    outs.append(synth.finalize(s_state))
    y = jnp.concatenate(outs, axis=-1)[..., synth.warmup_samples:]
    # offline pipeline reconstructs perfectly; streaming must match
    np.testing.assert_allclose(np.asarray(y[..., :n]), np.asarray(x),
                               atol=1e-5)


def test_online_enhancer_equals_offline():
    """Causal chunked enhancement (streaming STFT -> stateful LSTM mask
    -> streaming iSTFT) == offline full-utterance processing."""
    from padertorch_tpu.modules.recurrent import LSTM
    from padertorch_tpu.nn import Linear

    size, shift, bins = 256, 64, 129
    stft = STFT(size, shift, complex_representation='stacked')

    lstm = LSTM(input_size=bins, hidden_size=32, num_layers=1)
    head = Linear(32, bins)
    lstm.eval(), head.eval()

    def mask_net(feats, state=None):
        h, state = lstm(feats, state=state)
        return jax.nn.sigmoid(head(h)), state

    x = _signal((2, 32 * shift), seed=7)

    # offline
    spec = stft(x)  # (B, T, F, 2)
    mag = jnp.sqrt(spec[..., 0] ** 2 + spec[..., 1] ** 2 + 1e-8)
    mask, _ = mask_net(mag)
    ref = stft.inverse(spec * mask[..., None])

    # streaming, 4 frames (= 256 samples) per chunk
    streamer, synth = StreamingSTFT(stft), StreamingISTFT(stft)

    def chunk_step(carry, chunk):
        a_state, s_state, lstm_state = carry
        a_state, frames = streamer.step(a_state, chunk)
        m = jnp.sqrt(frames[..., 0] ** 2 + frames[..., 1] ** 2 + 1e-8)
        mask, lstm_state = mask_net(m, lstm_state)
        s_state, samples = synth.step(s_state, frames * mask[..., None])
        return (a_state, s_state, lstm_state), samples

    chunk_step = jax.jit(chunk_step)
    carry = (streamer.init_state((2,)), synth.init_state((2,)), None)
    outs = []
    for start in range(0, x.shape[-1], 4 * shift):
        carry, samples = chunk_step(carry, x[..., start:start + 4 * shift])
        outs.append(samples)
    a_state, s_state, lstm_state = carry
    tail_frames = streamer.finalize(a_state)
    m = jnp.sqrt(tail_frames[..., 0] ** 2 + tail_frames[..., 1] ** 2
                 + 1e-8)
    mask, _ = mask_net(m, lstm_state)
    s_state, samples = synth.step(s_state, tail_frames * mask[..., None])
    outs.append(samples)
    outs.append(synth.finalize(s_state))
    got = jnp.concatenate(outs, axis=-1)[..., synth.warmup_samples:]

    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5)
