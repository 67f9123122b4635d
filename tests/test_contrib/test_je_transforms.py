"""je/data/transforms additions: TimeWarpedSTFT, StackArrays,
ConcatenateArrays, alignment-key frame annotation (ref transforms.py:229,
465, 520)."""
import numpy as np
import pytest

from padertorch_tpu.contrib.je.data.transforms import (
    STFT, TimeWarpedSTFT, StackArrays, ConcatenateArrays,
)


def test_stack_arrays_pads_to_max():
    batch = [np.ones((2, 3)), np.zeros((2, 5))]
    out = StackArrays()(batch)
    assert out.shape == (2, 2, 5)
    np.testing.assert_array_equal(out[0, :, 3:], 0)


def test_stack_arrays_cut_end_and_axis():
    batch = [np.ones((2, 3)), np.zeros((2, 5))]
    assert StackArrays(cut_end=True)(batch).shape == (2, 2, 3)
    assert StackArrays(axis=1)(batch).shape == (2, 2, 5)
    assert StackArrays(axis=-1)(batch).shape == (2, 5, 2)


def test_stack_arrays_nested_dict():
    batch = {'x': [np.ones((2, 3)), np.zeros((2, 5))], 'y': ['a', 'b']}
    out = StackArrays()(batch)
    assert out['x'].shape == (2, 2, 5)
    assert out['y'] == ['a', 'b']


def test_stack_arrays_rejects_multi_dim_mismatch():
    with pytest.raises(AssertionError):
        StackArrays()([np.ones((2, 3)), np.zeros((4, 5))])


def test_concatenate_arrays():
    out = ConcatenateArrays(axis=0)([np.ones((2, 3)), np.zeros((1, 3))])
    assert out.shape == (3, 3)
    nested = ConcatenateArrays(axis=-1)(
        {'x': [np.ones((2, 2)), np.zeros((2, 1))]})
    assert nested['x'].shape == (2, 3)


@pytest.fixture
def aligned_example():
    rng = np.random.RandomState(0)
    return {
        'audio_data': rng.rand(80000)[None],
        'labels': ['a', 'b', 'c'],
        'labels_start_samples': [100, 12000, 24000],
        'labels_stop_samples': [40000, 60000, 80000],
    }


def test_stft_alignment_keys(aligned_example):
    stft = STFT(200, 1024, 800, alignment_keys=['labels'],
                pad=True, fading='full')
    out = stft(dict(aligned_example))
    assert 'labels_start_frames' in out and 'labels_stop_frames' in out
    assert len(out['labels_start_frames']) == 3
    assert out['labels_start_frames'] == sorted(out['labels_start_frames'])
    assert all(
        start < stop for start, stop in
        zip(out['labels_start_frames'], out['labels_stop_frames']))


def test_time_warped_stft(aligned_example):
    stft = STFT(200, 1024, 800, alignment_keys=['labels'],
                pad=True, fading='full')
    plain = stft(dict(aligned_example))
    warped = TimeWarpedSTFT(stft, lambda: 0.5, lambda: 0.1)(
        dict(aligned_example))
    # frame count approximately preserved (rounding of the two shifts)
    assert abs(warped['stft'].shape[1] - plain['stft'].shape[1]) <= 2
    num_frames = warped['stft'].shape[1]
    for key in ('labels_start_frames', 'labels_stop_frames'):
        frames = warped[key]
        assert frames == sorted(frames)
        assert all(0 <= f <= num_frames for f in frames)
    # positive anchor shift squeezes the left part: early events move later
    assert warped['labels_start_frames'][1] > plain['labels_start_frames'][1]


def test_time_warped_stft_identity_when_no_shift(aligned_example):
    stft = STFT(200, 1024, 800, alignment_keys=['labels'],
                pad=True, fading='full')
    plain = stft(dict(aligned_example))
    warped = TimeWarpedSTFT(stft, lambda: 0.5, lambda: 0.0)(
        dict(aligned_example))
    np.testing.assert_allclose(
        warped['stft'], plain['stft'], atol=1e-5)


def test_fused_audio_logmel_extractor_backends_match():
    import jax.numpy as jnp
    from padertorch_tpu import random as ptrandom
    from padertorch_tpu.contrib.je.modules.features import (
        FusedAudioLogMelExtractor)
    from padertorch_tpu.ops.pallas.logmel import LogMelFrontend

    ptrandom.seed(0)
    extractor = FusedAudioLogMelExtractor(
        16000, 512, 128, 40, backend='jnp').eval()
    x = jnp.asarray(
        np.random.RandomState(0).randn(2, 4000).astype('float32'))
    spec = extractor._stft(x)
    power = spec[..., 0] ** 2 + spec[..., 1] ** 2
    logmel_jnp = jnp.log(power @ extractor.fbanks + 1e-12)
    logmel_pallas = LogMelFrontend(
        sample_rate=16000, size=512, shift=128, n_mels=40,
        interpret=True)(x)
    np.testing.assert_allclose(
        np.asarray(logmel_pallas), np.asarray(logmel_jnp),
        atol=1e-3, rtol=1e-4)


def test_fused_audio_logmel_extractor_fbanks_frozen():
    # the filterbank must be a buffer: if it trained, entries could go
    # negative and log(power @ fbanks) would NaN
    from padertorch_tpu import random as ptrandom
    from padertorch_tpu.contrib.je.modules.features import (
        FusedAudioLogMelExtractor)
    from padertorch_tpu.module import partition

    ptrandom.seed(0)
    extractor = FusedAudioLogMelExtractor(16000, 512, 128, 40)
    params, static = partition(extractor)
    import jax
    trainable_shapes = [
        tuple(leaf.shape) for leaf in jax.tree_util.tree_leaves(params)
        if hasattr(leaf, 'shape')
    ]
    assert (257, 40) not in trainable_shapes, trainable_shapes


def test_time_warped_stft_left_segment_scaling(aligned_example):
    """Events left of the anchor must land at round(frame * warp_factor)
    — regression test for the boundary frame being computed in padded
    coordinates (which offset the whole right-segment mapping)."""
    stft = STFT(200, 1024, 800, alignment_keys=['labels'],
                pad=True, fading='full')
    plain = stft(dict(aligned_example))
    warped = TimeWarpedSTFT(stft, lambda: 0.5, lambda: 0.1)(
        dict(aligned_example))
    warp_factor = 200 / round(200 / 1.2)  # as computed by the transform
    for plain_frame, warped_frame in zip(
            plain['labels_start_frames'], warped['labels_start_frames']):
        if plain_frame < 150:  # comfortably left of the anchor
            assert abs(warped_frame - round(plain_frame * warp_factor)) \
                <= 1, (plain_frame, warped_frame, warp_factor)
