"""audio_tagging real-data pipeline: tiny synthetic json + wav tree
through get_datasets/prepare_dataset and the --database train path."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest
from scipy.io import wavfile

from padertorch_tpu.contrib.examples.sound_recognition.audio_tagging \
    import data as tagging_data

EVENTS = ['dog', 'siren', 'speech']


def _make_db(root, num_train=6, num_eval=2, sr=16000, seconds=0.6):
    """Write a wav tree + AudioSet-style JsonDatabase."""
    rng = np.random.RandomState(0)
    (root / 'audio').mkdir(parents=True, exist_ok=True)
    datasets = {}
    for split, n in (('balanced_train', num_train),
                     ('validate', num_eval), ('eval', num_eval)):
        examples = {}
        for i in range(n):
            n_samples = int(sr * seconds) + 400 * (i % 3)
            audio = (0.1 * rng.randn(n_samples)).astype(np.float32)
            path = root / 'audio' / f'{split}_{i}.wav'
            wavfile.write(path, sr, audio)
            active = [EVENTS[i % 3]] + (
                [EVENTS[(i + 1) % 3]] if i % 2 else [])
            examples[f'{split}_{i}'] = {
                'audio_path': str(path),
                'audio_length': n_samples / sr,
                'events': active,
                'dataset': split,
            }
        datasets[split] = examples
    db_path = root / 'db.json'
    db_path.write_text(json.dumps({'datasets': datasets}))
    return db_path


def test_get_datasets_real_tree(tmp_path):
    db_path = _make_db(tmp_path)
    train, validate, evalset = tagging_data.get_datasets(
        db_path,
        audio_reader={'target_sample_rate': 16000},
        stft=dict(shift=160, size=512, window_length=400, pad=True,
                  fading=None),
        batch_size=2, storage_dir=tmp_path, num_workers=0)
    # encoder labels persisted to the storage dir
    labels = json.loads((tmp_path / 'eventss.json').read_text())
    assert labels == sorted(EVENTS)

    batch = next(iter(train))
    assert batch['stft'].ndim == 5  # (B, C=1, T, F, 2)
    assert batch['stft'].shape[0] == 2
    assert batch['events'].shape == (2, 3)
    assert set(batch['events'].reshape(-1)) <= {0.0, 1.0}
    assert batch['seq_len'].dtype == np.int32
    # validation batches exist too
    vbatch = next(iter(validate))
    assert vbatch['events'].shape[-1] == 3


def test_prepare_dataset_length_filter_and_scaling(tmp_path):
    db_path = _make_db(tmp_path)
    from padertorch_tpu.data.database import JsonDatabase
    from padertorch_tpu.contrib.je.data.transforms import MultiHotEncoder
    db = JsonDatabase(db_path)
    ds = db.get_dataset('balanced_train')
    enc = MultiHotEncoder(label_key='events', storage_dir=tmp_path)
    enc.initialize_labels(dataset=ds)
    out = tagging_data.prepare_dataset(
        ds, audio_reader={'target_sample_rate': 16000},
        stft=dict(shift=160, size=512, window_length=400, pad=True,
                  fading=None),
        event_encoder=enc, num_workers=0, batch_size=2,
        max_padding_rate=0.5, min_signal_length=0.0,
        max_signal_length=0.62, training=True)
    batches = list(out)
    # the filter drops the longer files (0.6s + 400/800 extra samples)
    ids = [i for b in batches for i in b['example_id']]
    assert all('_0' in i or '_3' in i or '+' in i for i in ids), ids


def test_mixup_superpose():
    ex1 = {'example_id': 'a', 'stft': np.ones((1, 10, 4), np.float32),
           'seq_len': 10, 'events': np.array([1., 0.])}
    ex2 = {'example_id': 'b', 'stft': np.ones((1, 6, 4), np.float32),
           'seq_len': 6, 'events': np.array([0., 1.])}
    rng = np.random.RandomState(0)
    out = tagging_data._superpose(ex1, ex2, min_overlap=1.0,
                                  max_length=None, rng=rng)
    assert out['example_id'] == 'a+b'
    np.testing.assert_array_equal(out['events'], [1., 1.])
    # full overlap forced: first 6 frames sum to 2
    np.testing.assert_array_equal(out['stft'][0, :6, 0], 2)
    assert out['stft'].shape[1] == 10


def test_log_truncated_normal_bounds():
    rng = np.random.RandomState(0)
    x = tagging_data.log_truncated_normal(
        1000, loc=1.0, truncation=3.0, rng=rng)
    assert (x > 0).all()
    assert x.max() <= np.exp(4.0) + 1e-6
    assert x.min() >= np.exp(-2.0) - 1e-6


@pytest.mark.slow
def test_train_with_database_smoke(tmp_path):
    db_path = _make_db(tmp_path / 'db', num_train=8, num_eval=5)
    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    env.pop('PALLAS_AXON_POOL_IPS', None)
    env['PYTHONPATH'] = os.pathsep.join(
        p for p in [os.getcwd()]
        + env.get('PYTHONPATH', '').split(os.pathsep)
        if p and '.axon_site' not in p)
    proc = subprocess.run(
        [sys.executable, '-m',
         'padertorch_tpu.contrib.examples.sound_recognition'
         '.audio_tagging.train',
         '--storage_root', str(tmp_path), '--database', str(db_path),
         '--epochs', '1', '--batch_size', '2'],
        env=env, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-3000:]
    run = next((tmp_path / 'tagging').iterdir())
    assert (run / 'eventss.json').exists()
    assert any((run / 'checkpoints').glob('ckpt_*.ptt'))


def test_mixup_dataset_is_lazy_and_rerandomizes():
    rng = np.random.default_rng(6)
    examples = [
        {'dataset': '', 'example_id': f'e{i}',
         'stft': rng.normal(size=(1, 8, 4)).astype(np.float32),
         'seq_len': 8,
         'events': (rng.uniform(size=3) > 0.5).astype(np.float32)}
        for i in range(12)
    ]
    from padertorch_tpu.data import dataset as lazy
    ds = tagging_data._MixUpDataset(
        lazy.from_list(examples), mixup_probs=(0.3, 0.7),
        min_overlap=0.5, max_length=None, buffer_size=8)
    assert isinstance(ds, lazy.Dataset)
    first = [ex['example_id'] for ex in ds]
    second = [ex['example_id'] for ex in ds]
    # mixup partners re-randomize between epochs
    assert first != second or all('+' not in i for i in first + second)
    # downstream bucketing + collate still works lazily
    batches = list(ds.batch_dynamic_time_series_bucket(
        batch_size=3, len_key='seq_len', max_padding_rate=0.9))
    assert sum(len(b) for b in batches) >= 10
