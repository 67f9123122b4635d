"""Conformer-CTC speech recognition recipe tests.

Fast unit tests for the model (shapes, subsample arithmetic, loss and
gradients, greedy decode bookkeeping) plus a slow-marked subprocess
smoke of train.py -> evaluate.py like the other recipes
(``test_recipe_evaluate.py``).
"""
import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import padertorch_tpu as pt
from padertorch_tpu import random as ptrandom
from padertorch_tpu.contrib.examples.speech_recognition.ctc import data
from padertorch_tpu.contrib.examples.speech_recognition.ctc.model import (
    ConformerCTC,
)

REPO_ROOT = Path(__file__).resolve().parents[2]


def _tiny_model(**updates):
    ptrandom.seed(0)
    return ConformerCTC.from_config(ConformerCTC.get_config({
        'vocab_size': 10, 'd_model': 32, 'num_layers': 1,
        'num_heads': 2, 'kernel_size': 7, 'subsample_channels': 8,
        **updates,
    }))


def _batch(batch_size=4, num_examples=8):
    ds = data.synthetic_database(num_examples=num_examples)
    return next(iter(data.prepare_dataset(
        ds, batch_size=batch_size, shuffle=False, prefetch=False)))


def test_forward_shapes_and_subsample_lengths():
    model = _tiny_model().eval()
    batch = _batch()
    out = model(batch)
    b, t, v = out['logits'].shape
    assert b == 4 and v == 11
    # conv subsampling: two stride-2 convs => ceil(ceil(T/2)/2)
    t_in = batch['stft'].shape[2]  # (B, C, T, F, 2)
    assert t == -(-(-(-t_in // 2)) // 2)
    np.testing.assert_array_equal(
        np.asarray(out['logit_lengths']),
        -(-(-(-np.asarray(batch['seq_len']) // 2)) // 2))
    # CTC is only defined when the path is long enough
    assert (np.asarray(out['logit_lengths'])
            >= np.asarray(batch['label_lengths'])).all()


def test_review_loss_and_gradients():
    model = _tiny_model()
    batch = _batch()

    from padertorch_tpu.module import partition, combine
    params, static = partition(model)

    def loss_fn(p):
        m = combine(p, static)
        with ptrandom.key_context(jax.random.PRNGKey(0)):
            return m.review(batch, m(batch))['loss']

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert leaves and all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # at least one nontrivial gradient in the head and the frontend side
    assert any(float(np.abs(np.asarray(g)).max()) > 0 for g in leaves)


def test_specaugment_only_in_train_mode():
    model = _tiny_model()
    batch = _batch()
    with ptrandom.key_context(jax.random.PRNGKey(0)):
        out1 = model.eval()(batch)['logits']
    with ptrandom.key_context(jax.random.PRNGKey(1)):
        out2 = model.eval()(batch)['logits']
    np.testing.assert_allclose(
        np.asarray(out1), np.asarray(out2), rtol=0, atol=0)
    with ptrandom.key_context(jax.random.PRNGKey(0)):
        t1 = model.train()(batch)['logits']
    with ptrandom.key_context(jax.random.PRNGKey(1)):
        t2 = model.train()(batch)['logits']
    assert np.abs(np.asarray(t1) - np.asarray(t2)).max() > 0


def test_causal_variant_exact_prefix_property():
    """Streaming contract: for --causal, logits of a truncated input
    prefix equal the corresponding prefix of the full-input logits
    (left-padded subsample convs + causal encoder)."""
    model = _tiny_model(causal=True).eval()
    batch = _batch(batch_size=2)
    full = np.asarray(model(batch)['logits'])
    t_in = batch['stft'].shape[2]
    t_prefix = t_in // 2 + 3
    prefix_batch = dict(batch)
    prefix_batch['stft'] = batch['stft'][:, :, :t_prefix]
    prefix_batch['seq_len'] = np.minimum(
        np.asarray(batch['seq_len']), t_prefix)
    prefix = np.asarray(model(prefix_batch)['logits'])
    n = -(-(-(-t_prefix // 2)) // 2)
    # only frames within both runs' valid lengths are comparable
    valid = np.minimum(
        n, np.asarray(model(prefix_batch)['logit_lengths']))
    for b in range(2):
        np.testing.assert_allclose(
            prefix[b, :valid[b]], full[b, :valid[b]], atol=1e-5,
            err_msg=f'example {b}')


def test_decode_bookkeeping():
    model = _tiny_model().eval()
    batch = _batch()
    results = model.decode(batch)
    assert set(results) == set(batch['example_id'])
    for example_id, r in results.items():
        assert r['num_tokens'] == len(r['reference'])
        assert r['num_errors'] <= max(
            len(r['reference']), len(r['hypothesis']))
        assert all(1 <= tok <= 10 for tok in r['reference'])


def _tiny_transducer(**updates):
    from padertorch_tpu.contrib.examples.speech_recognition.ctc.model \
        import TransducerASR
    ptrandom.seed(0)
    return TransducerASR.from_config(TransducerASR.get_config({
        'vocab_size': 10, 'd_model': 32, 'num_layers': 1,
        'num_heads': 2, 'kernel_size': 7, 'subsample_channels': 8,
        'pred_hidden': 16, 'joint_dim': 16,
        **updates,
    }))


def test_transducer_forward_review_and_gradients():
    model = _tiny_transducer()
    batch = _batch()
    out = model.eval()(batch)
    b, t, u1, v = out['logits'].shape
    assert b == 4 and v == 11
    assert u1 == batch['labels'].shape[1] + 1

    from padertorch_tpu.module import partition, combine
    params, static = partition(model)

    def loss_fn(p):
        m = combine(p, static)
        with ptrandom.key_context(jax.random.PRNGKey(0)):
            return m.review(batch, m(batch))['loss']

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert leaves and all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # the prediction network must receive gradient (lattice label moves)
    emb_grad = np.asarray(jax.tree_util.tree_leaves(
        grads.embed)[0]) if hasattr(grads, 'embed') else None
    assert emb_grad is None or np.abs(emb_grad).max() > 0


def test_transducer_decode_bookkeeping():
    model = _tiny_transducer().eval()
    batch = _batch(batch_size=2)
    results = model.decode(batch)
    assert set(results) == set(batch['example_id'])
    for r in results.values():
        assert r['num_tokens'] == len(r['reference'])
        assert all(tok != 0 for tok in r['hypothesis'])


def test_ctc_beam_decode_bookkeeping():
    """Beam decode returns the same contract as greedy; on a random
    tiny model the hypotheses may differ but the bookkeeping must
    hold, and width-1 beam equals greedy when the model is confident
    (peaked logits make best-path == posterior argmax)."""
    model = _tiny_model().eval()
    batch = _batch(batch_size=2)
    results = model.decode(batch, beam_width=4)
    assert set(results) == set(batch['example_id'])
    for r in results.values():
        assert r['num_tokens'] == len(r['reference'])
        assert all(tok != 0 for tok in r['hypothesis'])


def test_transducer_beam_decode_bookkeeping():
    model = _tiny_transducer().eval()
    batch = _batch(batch_size=2)
    greedy = model.decode(batch)
    beam = model.decode(batch, beam_width=4)
    assert set(beam) == set(batch['example_id'])
    for k, r in beam.items():
        assert r['num_tokens'] == len(r['reference'])
        assert all(tok != 0 for tok in r['hypothesis'])
        # beam search maximizes sequence posterior; with width 4 it
        # should never be much longer than greedy on a tiny model
        assert len(r['hypothesis']) <= len(greedy[k]['hypothesis']) + 8


def _run(module, *args, timeout=560):
    env = {
        **os.environ,
        'JAX_PLATFORMS': 'cpu',
        'PYTHONPATH': str(REPO_ROOT),
    }
    proc = subprocess.run(
        [sys.executable, '-m', module, *args],
        env=env, capture_output=True, text=True, timeout=timeout,
        cwd=str(REPO_ROOT),
    )
    assert proc.returncode == 0, (
        f'{module} failed\nstdout: {proc.stdout[-3000:]}\n'
        f'stderr: {proc.stderr[-3000:]}')
    return proc.stdout


@pytest.mark.slow
def test_ctc_asr_train_then_evaluate(tmp_path):
    pkg = 'padertorch_tpu.contrib.examples.speech_recognition.ctc'
    _run(f'{pkg}.train',
         '--storage_root', str(tmp_path), '--synthetic',
         '--epochs', '2', '--batch_size', '4', '--num_examples', '24',
         '--d_model', '32', '--num_layers', '1', '--num_heads', '2')
    storage_dir = tmp_path / 'ctc_asr' / '1'
    _run(f'{pkg}.evaluate',
         '--model_path', str(storage_dir), '--synthetic',
         '--num_examples', '8', '--batch_size', '4')
    means = json.loads((storage_dir / 'eval' / 'means.json').read_text())
    assert 0.0 <= means['wer'] and 0.0 <= means['ser'] <= 1.0
    assert means['num_examples'] == 8
    transcriptions = json.loads(
        (storage_dir / 'eval' / 'transcriptions.json').read_text())
    assert len(transcriptions) == 8
    from test_recipe_evaluate import assert_validation_loss_decreased
    assert_validation_loss_decreased(storage_dir)


@pytest.mark.slow
def test_transducer_asr_train_then_evaluate(tmp_path):
    pkg = 'padertorch_tpu.contrib.examples.speech_recognition.ctc'
    _run(f'{pkg}.train',
         '--storage_root', str(tmp_path), '--synthetic',
         '--model', 'transducer',
         '--epochs', '2', '--batch_size', '4', '--num_examples', '24',
         '--d_model', '32', '--num_layers', '1', '--num_heads', '2')
    storage_dir = tmp_path / 'ctc_asr' / '1'
    _run(f'{pkg}.evaluate',
         '--model_path', str(storage_dir), '--synthetic',
         '--num_examples', '4', '--batch_size', '4')
    means = json.loads((storage_dir / 'eval' / 'means.json').read_text())
    assert means['num_examples'] == 4 and 0.0 <= means['ser'] <= 1.0
    from test_recipe_evaluate import assert_validation_loss_decreased
    assert_validation_loss_decreased(storage_dir)


def _tiny_aed(**updates):
    from padertorch_tpu.contrib.examples.speech_recognition.ctc.model \
        import AttentionASR
    ptrandom.seed(0)
    return AttentionASR.from_config(AttentionASR.get_config({
        'vocab_size': 10, 'd_model': 32, 'num_layers': 1,
        'num_heads': 2, 'kernel_size': 7, 'subsample_channels': 8,
        'decoder_layers': 1, 'max_decode_len': 16,
        **updates,
    }))


def test_aed_forward_review_and_gradients():
    model = _tiny_aed()
    batch = _batch()
    out = model.eval()(batch)
    b, u1, v = out['logits'].shape
    assert b == 4 and v == 12  # V + BOS + EOS
    assert u1 == batch['labels'].shape[1] + 1

    from padertorch_tpu.module import partition, combine
    params, static = partition(model)

    def loss_fn(p):
        m = combine(p, static)
        with ptrandom.key_context(jax.random.PRNGKey(0)):
            return m.review(batch, m(batch))['loss']

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert leaves and all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # decoder embedding must receive gradient (teacher forcing)
    emb = np.asarray(grads.embed.weight)
    assert np.abs(emb).max() > 0


def test_aed_review_label_smoothing_numpy_oracle():
    """The masked label-smoothed CE matches an independent numpy
    re-execution on the model's own logits."""
    model = _tiny_aed()
    batch = _batch(batch_size=3, num_examples=6)
    out = model.eval()(batch)
    loss = float(model.review(batch, out)['loss'])

    logits = np.asarray(out['logits'], dtype='float64')
    labels = np.asarray(batch['labels'])
    lengths = np.asarray(batch['label_lengths'])
    eps = model.label_smoothing
    per_utt = []
    for i in range(logits.shape[0]):
        ce = []
        for u in range(lengths[i] + 1):
            target = labels[i, u] if u < lengths[i] else model.eos
            x = logits[i, u]
            logp = x - (np.log(np.sum(np.exp(x - x.max()))) + x.max())
            ce.append((1 - eps) * -logp[target] + eps * -logp.mean())
        per_utt.append(np.mean(ce))
    np.testing.assert_allclose(loss, np.mean(per_utt), rtol=1e-5)


def test_aed_review_padding_invariance():
    """Labels beyond label_length are masked: changing them must not
    change the loss (the decoder input rows they feed sit after every
    valid causal position and every scored target)."""
    model = _tiny_aed()
    batch = _batch()
    out_ref = model.eval()(batch)
    loss_ref = float(model.review(batch, out_ref)['loss'])

    corrupted = dict(batch)
    labels = np.array(batch['labels'])
    lengths = np.asarray(batch['label_lengths'])
    for i in range(labels.shape[0]):
        labels[i, lengths[i]:] = (labels[i, lengths[i]:] + 3) % 10 + 1
    corrupted['labels'] = labels
    out = model.eval()(corrupted)
    loss = float(model.review(corrupted, out)['loss'])
    np.testing.assert_allclose(loss, loss_ref, rtol=1e-6)


def test_aed_decode_bookkeeping():
    model = _tiny_aed().eval()
    batch = _batch(batch_size=2)
    greedy = model.decode(batch)
    assert set(greedy) == set(batch['example_id'])
    for r in greedy.values():
        assert r['num_tokens'] == len(r['reference'])
        assert all(1 <= tok <= 10 for tok in r['hypothesis'])
        assert len(r['hypothesis']) <= model.max_decode_len
    beam = model.decode(batch, beam_width=4)
    assert set(beam) == set(batch['example_id'])
    for r in beam.values():
        assert all(1 <= tok <= 10 for tok in r['hypothesis'])


@pytest.mark.slow
def test_aed_asr_train_then_evaluate(tmp_path):
    pkg = 'padertorch_tpu.contrib.examples.speech_recognition.ctc'
    _run(f'{pkg}.train',
         '--storage_root', str(tmp_path), '--synthetic',
         '--model', 'aed',
         '--epochs', '2', '--batch_size', '4', '--num_examples', '24',
         '--d_model', '32', '--num_layers', '1', '--num_heads', '2')
    storage_dir = tmp_path / 'ctc_asr' / '1'
    _run(f'{pkg}.evaluate',
         '--model_path', str(storage_dir), '--synthetic',
         '--num_examples', '4', '--batch_size', '4', '--beam_width', '4')
    means = json.loads((storage_dir / 'eval' / 'means.json').read_text())
    assert means['num_examples'] == 4 and 0.0 <= means['ser'] <= 1.0
    from test_recipe_evaluate import assert_validation_loss_decreased
    assert_validation_loss_decreased(storage_dir)


def test_acoustic_encoder_stream_equals_one_shot():
    """Carried-state streaming (frontend + subsample convs + conformer
    KV/conv state) reproduces the causal one-shot encoder exactly —
    O(chunk) work per call, not prefix recompute."""
    model = _tiny_model(causal=True).eval()
    batch = _batch(batch_size=2)
    stft = jnp.asarray(batch['stft'])
    t_in = (stft.shape[2] // 8) * 8
    stft = stft[:, :, :t_in]
    full, _ = model.acoustic(stft)
    full = np.asarray(full)

    state = model.acoustic.init_stream(2, max_frames=t_in)
    outs = []
    for start in range(0, t_in, 8):
        y, state = model.acoustic.stream_step(
            stft[:, :, start:start + 8], state, start)
        outs.append(np.asarray(y))
    np.testing.assert_allclose(
        np.concatenate(outs, axis=1), full, atol=1e-4)


def test_transducer_stream_decode_equals_offline_greedy():
    model = _tiny_transducer(causal=True).eval()
    batch = _batch(batch_size=1)
    stft = np.asarray(batch['stft'])
    t_in = (int(batch['seq_len'][0]) // 8) * 8
    offline_batch = {
        'example_id': batch['example_id'][:1],
        'stft': stft[:1, :, :t_in],
        'seq_len': np.asarray([t_in], dtype='int32'),
        'labels': batch['labels'][:1],
        'label_lengths': batch['label_lengths'][:1],
    }
    offline = model.decode(offline_batch)
    offline_hyp = list(offline.values())[0]['hypothesis']

    chunks = [stft[0, :, s:s + 8] for s in range(0, t_in, 8)]
    # chunks arrive as (C, Tc, F, 2) -> pass (Tc, F, 2)
    chunks = [c[0] for c in chunks]
    streamed = model.stream_decode(chunks, max_frames=t_in)
    assert streamed == offline_hyp


def test_aed_serve_decode_equals_greedy():
    """The continuous-batching serving path (slot pool smaller than the
    batch, early-exit slot reuse) yields exactly the greedy decode
    transcripts."""
    model = _tiny_aed().eval()
    batch = _batch(batch_size=4)
    greedy = model.decode(batch)
    served = model.serve_decode(batch, num_slots=2)
    assert {k: v['hypothesis'] for k, v in served.items()} \
        == {k: v['hypothesis'] for k, v in greedy.items()}
