"""Smoke tests: every recipe's evaluate.py runs end-to-end after a tiny
training, printing a metrics dict and writing eval artifacts.

These run the actual module entry points in subprocesses (like a user
would) so argument parsing, checkpoint resolution, and result dumping
are all covered.  Mirrors the reference's one-deliverable-per-recipe
contract (train.py + evaluate.py, SURVEY.md section 2.6).
"""
import json
import os

import numpy as np
import subprocess
import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parents[2]


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


PKG = 'padertorch_tpu.contrib.examples'


def assert_validation_loss_decreased(storage_dir):
    """Quality gate (reference burn-test philosophy,
    ``runtime_tests.py`` loss-change asserts): the recipe's own tfevents
    must show the post-training validation loss below the pre-training
    one — catches silent learning regressions that a runs-to-completion
    smoke cannot."""
    from padertorch_tpu.summary.tfevents import scalars_from_events
    events = sorted(Path(storage_dir).glob('events.out.tfevents.*'))
    assert events, f'no tfevents in {storage_dir}'
    series = []
    for path in events:
        series += scalars_from_events(path).get('validation/loss', [])
    series.sort(key=lambda sv: sv[0])
    assert len(series) >= 2, (
        f'need pre+post validation losses, got {series}')
    first, last = series[0][1], series[-1][1]
    assert last < first, (
        f'validation loss did not improve: {first} -> {last} '
        f'({storage_dir})')


@pytest.mark.slow
def test_wavenet_train_then_evaluate(tmp_path):
    _run(f'{PKG}.audio_synthesis.wavenet.train',
         '--storage_root', str(tmp_path), '--synthetic',
         '--epochs', '1', '--small')
    storage_dir = tmp_path / 'wavenet' / '1'
    out = _run(f'{PKG}.audio_synthesis.wavenet.evaluate',
               '--model_path', str(storage_dir), '--synthetic',
               '--num_synthetic_examples', '2',
               '--synthetic_samples', '2000',
               '--chunk_length', '1000', '--chunk_overlap', '200',
               '--parallel')
    means = json.loads((storage_dir / 'eval' / 'means.json').read_text())
    assert 'rmse' in means and means['num_examples'] == 2, (means, out)
    assert (storage_dir / 'eval' / 'rmse.json').exists()
    assert_validation_loss_decreased(storage_dir)
    assert list((storage_dir / 'eval' / 'audio').glob('*.wav'))


@pytest.mark.slow
def test_speaker_clf_train_then_evaluate(tmp_path):
    _run(f'{PKG}.speaker_classification.supervised.train',
         '--storage_root', str(tmp_path), '--synthetic', '--epochs', '1')
    storage_dir = tmp_path / 'speaker_clf' / '1'
    _run(f'{PKG}.speaker_classification.supervised.evaluate',
         '--model_path', str(storage_dir), '--synthetic')
    means = json.loads((storage_dir / 'eval' / 'means.json').read_text())
    assert 0.0 <= means['accuracy'] <= 1.0
    assert (storage_dir / 'eval' / 'misclassified.json').exists()
    assert_validation_loss_decreased(storage_dir)


@pytest.mark.slow
def test_audio_tagging_train_then_evaluate(tmp_path):
    _run(f'{PKG}.sound_recognition.audio_tagging.train',
         '--storage_root', str(tmp_path), '--synthetic', '--epochs', '1')
    storage_dir = tmp_path / 'tagging' / '1'
    _run(f'{PKG}.sound_recognition.audio_tagging.evaluate',
         '--model_path', str(storage_dir), '--synthetic')
    means = json.loads((storage_dir / 'eval' / 'means.json').read_text())
    for key in ('mAP', 'mAUC', 'lwlrap', 'mF1'):
        assert 0.0 <= means[key] <= 1.0, (key, means)
    assert_validation_loss_decreased(storage_dir)


@pytest.mark.slow
def test_tasnet_sepformer_train_then_evaluate(tmp_path):
    """The dual-path transformer (SepFormer-style) separator variant
    trains and evaluates end-to-end like the DPRNN one."""
    _run(f'{PKG}.source_separation.tasnet.train',
         '--storage_root', str(tmp_path), '--synthetic',
         '--epochs', '1', '--variant', 'sepformer', '--small',
         '--batch_size', '2', '--num_examples', '8')
    storage_dir = tmp_path / 'tasnet' / '1'
    _run(f'{PKG}.source_separation.tasnet.evaluate',
         '--model_path', str(storage_dir), '--synthetic')
    means = json.loads((storage_dir / 'eval' / 'means.json').read_text())
    assert any('si_sdr' in k for k in means), means
    assert np.isfinite(means['improvement_si_sdr']), means
    # time-domain separation from random init does not reach positive
    # SI-SDRi in an 8-example smoke; the learning gate is the val loss
    assert_validation_loss_decreased(storage_dir)


@pytest.mark.slow
def test_pit_train_then_evaluate_improves_si_sdr(tmp_path):
    """The flagship recipe's quality gate: after the synthetic smoke
    train, masking must IMPROVE SI-SDR over the mixture by a wide
    margin (measured ~6 dB after one epoch; gate at 3 dB)."""
    _run(f'{PKG}.source_separation.pit.train',
         '--storage_root', str(tmp_path), '--synthetic',
         '--epochs', '1', '--units', '64', '--layers', '1')
    storage_dir = tmp_path / 'pit' / '1'
    _run(f'{PKG}.source_separation.pit.evaluate',
         '--model_path', str(storage_dir), '--synthetic')
    means = json.loads((storage_dir / 'eval' / 'means.json').read_text())
    assert means['improvement_si_sdr'] > 3.0, means
    assert means['improvement_mir_eval_sxr_sdr'] > 3.0, means
    assert_validation_loss_decreased(storage_dir)


@pytest.mark.slow
def test_pit_evaluate_multiprocess_matches_single(tmp_path):
    """A full recipe evaluate in TRUE multi-process mode: two concurrent
    ``pit.evaluate`` processes share the work via PT_EVAL_RANK/SIZE and
    the file-based gather in PT_EVAL_DIR (the dlp_mpi-style launcher
    contract, reference ``tasnet/evaluate.py`` mpiexec usage); the
    master's means.json must equal the single-process run.  Closes the
    round-4 gap that ``evaluation/parallel.py`` multi-worker mode was
    proven only on toy in-process datasets."""
    _run(f'{PKG}.source_separation.pit.train',
         '--storage_root', str(tmp_path), '--synthetic',
         '--epochs', '1', '--units', '64', '--layers', '1')
    storage_dir = tmp_path / 'pit' / '1'
    _run(f'{PKG}.source_separation.pit.evaluate',
         '--model_path', str(storage_dir), '--synthetic')
    means_path = storage_dir / 'eval' / 'means.json'
    single = json.loads(means_path.read_text())
    means_path.unlink()
    (storage_dir / 'eval' / 'result.json').unlink()

    gather_dir = tmp_path / 'gather'
    gather_dir.mkdir()
    procs = []
    logs = []
    for rank in range(2):
        env = {
            **os.environ,
            'JAX_PLATFORMS': 'cpu',
            'PYTHONPATH': str(REPO_ROOT),
            'PT_EVAL_RANK': str(rank),
            'PT_EVAL_SIZE': '2',
            'PT_EVAL_DIR': str(gather_dir),
        }
        # file-backed output: a PIPE would fill and deadlock the
        # rank while the test waits on the other one
        log = open(tmp_path / f'rank{rank}.log', 'w+')
        logs.append(log)
        procs.append(subprocess.Popen(
            [sys.executable, '-m',
             f'{PKG}.source_separation.pit.evaluate',
             '--model_path', str(storage_dir), '--synthetic'],
            env=env, cwd=str(REPO_ROOT),
            stdout=log, stderr=subprocess.STDOUT))
    try:
        for rank, proc in enumerate(procs):
            rc = proc.wait(timeout=560)
            logs[rank].seek(0)
            assert rc == 0, (
                f'rank {rank} failed\n{logs[rank].read()[-3000:]}')
    finally:
        for proc in procs:
            proc.kill()
        for log in logs:
            log.close()

    multi = json.loads(means_path.read_text())
    assert set(multi) == set(single), (multi, single)
    for key in single:
        assert multi[key] == pytest.approx(single[key], rel=1e-6), (
            key, multi[key], single[key])
    # only the master wrote results; both shards contributed
    results = json.loads(
        (storage_dir / 'eval' / 'result.json').read_text())
    assert len(results) == single.get('num_examples', len(results))


@pytest.mark.slow
def test_mask_estimator_train_then_evaluate(tmp_path):
    _run(f'{PKG}.speech_enhancement.mask_estimator.train',
         '--storage_root', str(tmp_path), '--synthetic',
         '--epochs', '1', '--num_units', '64')
    storage_dir = tmp_path / 'mask_estimator' / '1'
    _run(f'{PKG}.speech_enhancement.mask_estimator.evaluate',
         '--model_path', str(storage_dir), '--synthetic')
    means = json.loads((storage_dir / 'eval' / 'means.json').read_text())
    for condition in ('observed', 'masked', 'beamformed'):
        assert set(means[condition]) == {'stoi', 'si_sdr', 'sdr'}, means
    # quality gates: the mask must HELP (enhanced beats the mixture)
    # and the trainer's own validation loss must have gone down
    assert means['masked']['si_sdr'] > means['observed']['si_sdr'], means
    assert means['masked']['sdr'] > means['observed']['sdr'], means
    assert_validation_loss_decreased(storage_dir)


def test_distance_estimator_train_then_evaluate(tmp_path):
    _run(f'{PKG}.source_localization.distance_estimator.train',
         '--storage_root', str(tmp_path), '--synthetic', '--epochs', '1',
         '--feature', 'mag ild ipd')
    storage_dir = tmp_path / 'distance' / '1'
    _run(f'{PKG}.source_localization.distance_estimator.evaluate',
         '--model_path', str(storage_dir), '--synthetic')
    result = json.loads(
        (storage_dir / 'eval' / 'evaluation_result.json').read_text())
    summary = result['summary']
    assert summary['num_examples'] == 32
    assert summary['pseudo_accuracy'] >= summary['accuracy']


@pytest.mark.slow
def test_gan_vocoder_train_then_evaluate(tmp_path):
    _run(f'{PKG}.audio_synthesis.gan_vocoder.train',
         '--storage_root', str(tmp_path), '--synthetic',
         '--epochs', '1', '--small', '--batch_size', '2')
    storage_dir = tmp_path / 'gan_vocoder' / '1'
    out = _run(f'{PKG}.audio_synthesis.gan_vocoder.evaluate',
               '--model_path', str(storage_dir), '--synthetic',
               '--num_synthetic_examples', '2',
               '--synthetic_samples', '2000')
    means = json.loads((storage_dir / 'eval' / 'means.json').read_text())
    assert 'stft_loss' in means and means['num_examples'] == 2, (means, out)
    assert (storage_dir / 'eval' / 'stft_loss.json').exists()
    assert list((storage_dir / 'eval' / 'audio').glob('*.wav'))


@pytest.mark.slow
def test_fastspeech_train_then_evaluate(tmp_path):
    _run(f'{PKG}.audio_synthesis.fastspeech.train',
         '--storage_root', str(tmp_path), '--synthetic',
         '--epochs', '2', '--d_model', '32', '--num_layers', '1',
         '--num_examples', '16', '--batch_size', '4')
    storage_dir = tmp_path / 'fastspeech' / '1'
    out = _run(f'{PKG}.audio_synthesis.fastspeech.evaluate',
               '--model_path', str(storage_dir), '--synthetic',
               '--num_examples', '4')
    means = json.loads((storage_dir / 'eval' / 'means.json').read_text())
    assert means['num_examples'] == 4, (means, out)
    for key in ('mel_l1', 'mel_rmse', 'duration_mae'):
        assert np.isfinite(means[key]), means
    assert_validation_loss_decreased(storage_dir)
