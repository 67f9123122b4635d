"""jensheit SAD-eval semantics + ConvTasNet training recipe."""
import os
import subprocess
import sys

import numpy as np
import pytest

from padertorch_tpu.contrib.jensheit.eval_sad import (
    smooth_vad, adjust_annotation_fn, get_tp_fp_tn_fn, evaluate_model,
)


def test_smooth_vad_golden():
    # golden values from the reference doctests (eval_sad.py:7-15)
    v = np.array([.1, .2, .3, .4, .5, .6, .7, .2, .1])
    np.testing.assert_array_equal(
        smooth_vad(v, window=3, divisor=1, threshold=0.3),
        [0, 0, 1, 1, 1, 1, 1, 1, 0])
    np.testing.assert_array_equal(
        smooth_vad(v, window=5, divisor=1, threshold=0.5),
        [0, 0, 0, 0, 1, 1, 1, 1, 0])
    np.testing.assert_array_equal(
        smooth_vad(v, window=5, divisor=2, threshold=0.5),
        [0, 0, 0, 1, 1, 1, 1, 1, 1])
    out = smooth_vad(v[None, None], window=5, divisor=2, threshold=0.5)
    assert out.shape == (1, 1, 9)


def test_adjust_annotation_buffer_zone():
    # golden values from the reference doctests (eval_sad.py:39-44)
    annotation = np.array([0, 1, 1, 1, 0, 0, 0, 1])
    np.testing.assert_array_equal(
        adjust_annotation_fn(annotation, 1),
        [5, 1, 1, 1, 5, 0, 5, 1])
    np.testing.assert_array_equal(
        adjust_annotation_fn(annotation, 2),
        [5, 1, 1, 1, 5, 5, 5, 1])
    # no activity -> unchanged
    np.testing.assert_array_equal(
        adjust_annotation_fn(np.zeros(5, int), 4), np.zeros(5))
    # activity from sample 0 (no left edge)
    np.testing.assert_array_equal(
        adjust_annotation_fn(np.array([1, 1, 0, 0]), 1),
        [1, 1, 5, 0])


def test_get_tp_fp_tn_fn():
    annotation = np.array([0, 1, 1, 1, 0, 0, 0, 1])
    assert get_tp_fp_tn_fn(annotation, annotation, 1, False) \
        == (4, 0, 4, 0)
    vad = np.array([0, 1, 1, 1, 0, 1, 0, 1])
    assert get_tp_fp_tn_fn(annotation, vad, 1, False) == (4, 1, 3, 0)
    # with buffer-zone adjustment the off-by-one FP lands unscored
    vad = np.array([1, 1, 1, 1, 0, 0, 0, 1])
    tp, fp, tn, fn = get_tp_fp_tn_fn(annotation, vad, 1, True)
    assert (tp, fp, fn) == (4, 0, 0)


def test_evaluate_model_threshold_sweep():
    rng = np.random.default_rng(0)
    examples = [
        {'activation': (rng.uniform(size=64) > 0.5).astype(int),
         'scores': rng.uniform(size=64)}
        for _ in range(3)
    ]
    counts = evaluate_model(
        examples,
        model=lambda ex: ex['scores'],
        get_sad_fn=lambda out, th, ex: (out >= th).astype(int),
        num_thresholds=11, buffer_zone=0.0, sample_rate=1)
    assert counts.shape == (11, 4)
    # each threshold scores every sample exactly once
    np.testing.assert_array_equal(counts.sum(axis=1), 3 * 64)
    # threshold 0 -> everything voiced: no negatives predicted
    tp, fp, tn, fn = counts[0]
    assert tn == 0 and fn == 0
    # threshold > 1 -> nothing voiced: no positives predicted
    tp, fp, tn, fn = counts[-1]
    assert tp + fp <= 1  # only scores exactly equal to 1.0 survive


@pytest.mark.slow
def test_train_convtasnet_recipe_smoke(tmp_path):
    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    env.pop('PALLAS_AXON_POOL_IPS', None)
    env['PYTHONPATH'] = os.pathsep.join(
        p for p in [os.getcwd()]
        + env.get('PYTHONPATH', '').split(os.pathsep)
        if p and '.axon_site' not in p)
    proc = subprocess.run(
        [sys.executable, '-m',
         'padertorch_tpu.contrib.jensheit.train_convtasnet',
         '--storage_root', str(tmp_path), '--synthetic', '--epochs', '1',
         '--small', '--batch_size', '2', '--debug'],
        env=env, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-3000:]
    runs = list((tmp_path / 'convtasnet').iterdir())
    assert len(runs) == 1
    assert (runs[0] / 'config.json').exists()
    assert (runs[0] / 'Makefile').exists()
    assert any((runs[0] / 'checkpoints').glob('ckpt_*.ptt'))
    from test_recipe_evaluate import assert_validation_loss_decreased
    assert_validation_loss_decreased(runs[0])


def test_prepare_iterable_chain():
    from padertorch_tpu.contrib.jensheit.train_convtasnet import (
        prepare_iterable)
    from padertorch_tpu.data import dataset as lazy
    rng = np.random.default_rng(0)
    examples = [
        {'example_id': f'e{i}',
         'audio_data': {
             'y': rng.normal(size=4000).astype('float32'),
             's': rng.normal(size=(2, 4000)).astype('float32')},
         'num_samples': 4000}
        for i in range(4)
    ]
    ds = prepare_iterable(
        lazy.from_list(examples), None, batch_size=2, chunk_size=1000,
        prefetch=False)
    batch = next(iter(ds))
    assert batch['y'].shape == (2, 1000)
    assert batch['s'].shape == (2, 2, 1000)
    np.testing.assert_array_equal(batch['num_samples'], [1000, 1000])
