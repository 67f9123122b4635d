"""FastSpeech acoustic model: length regulator semantics, review
masking, synthesize bookkeeping, and a learnability burn test."""
import numpy as np
import pytest

import jax.numpy as jnp

import padertorch_tpu as pt
from padertorch_tpu import random as ptrandom
from padertorch_tpu.contrib.examples.audio_synthesis.fastspeech import data
from padertorch_tpu.contrib.examples.audio_synthesis.fastspeech.model \
    import FastSpeech, length_regulate


def _tiny_model():
    ptrandom.seed(0)
    return FastSpeech.from_config(FastSpeech.get_config({
        'vocab_size': data.VOCAB_SIZE,
        'n_mels': data.N_MELS,
        'd_model': 32,
        'encoder': {'num_layers': 1, 'num_heads': 2},
        'decoder': {'num_layers': 1, 'num_heads': 2},
    }))


def test_length_regulate_ragged_batch():
    enc = jnp.arange(12, dtype='float32').reshape(2, 3, 2)
    dur = jnp.array([[1, 2, 0],   # padded token has duration 0
                     [3, 1, 2]])
    frames, n = length_regulate(enc, dur, 8)
    assert n.tolist() == [3, 6]
    # frame -> token ownership
    np.testing.assert_array_equal(
        np.asarray(frames[0, :, 0]), [0, 2, 2, 0, 0, 0, 0, 0])
    np.testing.assert_array_equal(
        np.asarray(frames[1, :, 0]), [6, 6, 6, 8, 10, 10, 0, 0])


def test_forward_review_shapes_and_masking():
    model = _tiny_model().eval()
    ds = data.prepare_dataset(
        data.synthetic_database(num_examples=4), batch_size=4,
        shuffle=False, prefetch=False)
    batch = next(iter(ds))
    out = model(batch)
    assert out['mel'].shape == batch['mel'].shape
    assert out['log_durations'].shape == batch['tokens'].shape
    # frames past each example's total duration must be exactly zero
    for b in range(4):
        t = int(out['num_frames'][b])
        assert t == int(batch['durations'][b].sum())
        if t < out['mel'].shape[1]:
            assert np.abs(np.asarray(out['mel'][b, t:])).max() == 0.0
    review = model.review(batch, out)
    assert np.isfinite(float(review['loss']))


def test_synthesize_bookkeeping():
    model = _tiny_model().eval()
    tokens = jnp.asarray(np.array([[1, 5, 9, 0]], 'int32'))
    mel, num_frames, durations = model.synthesize(
        tokens, token_lengths=np.array([3], 'int32'), max_frames=64)
    assert mel.shape == (1, 64, data.N_MELS)
    d = np.asarray(durations)[0]
    assert (d[:3] >= 1).all() and d[3] == 0  # padding token silent
    assert int(num_frames[0]) == d.sum()
    # a large duration_scale must lengthen the output (random-init
    # models predict ~1-frame durations, so scale 4 -> ~4x)
    _, n2, _ = model.synthesize(
        tokens, token_lengths=np.array([3], 'int32'),
        max_frames=128, duration_scale=4.0)
    assert int(n2[0]) >= 2 * int(num_frames[0])


@pytest.mark.slow
def test_fastspeech_learns(tmp_path):
    """A few epochs on the deterministic task cut the mel loss by
    more than half (the mapping is noise-limited)."""
    model = _tiny_model()
    trainer = pt.Trainer(
        model=model,
        storage_dir=tmp_path,
        optimizer=pt.Adam(lr=2e-3, gradient_clipping=10.0),
        stop_trigger=(30, 'epoch'),
        summary_trigger=(10, 'epoch'),
        checkpoint_trigger=(10, 'epoch'),
    )
    ds = data.prepare_dataset(
        data.synthetic_database(num_examples=16), batch_size=8,
        shuffle=False, prefetch=False)
    batch = next(iter(ds))
    m0 = model.eval()
    loss0 = float(m0.review(batch, m0(batch))['loss'])
    trainer.train(ds, resume=False)
    m = trainer.model.eval()
    loss1 = float(m.review(batch, m(batch))['loss'])
    assert loss1 < 0.5 * loss0, (loss0, loss1)
