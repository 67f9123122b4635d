"""Tests for the small contrib data utilities added for reference
parity: ``contrib/data/utils.py`` (check_audio_files_exist),
``contrib/je/data/utils.py`` (extended bucketing, split_dataset),
``contrib/ldrude/data.py`` (IBM feature pipeline)."""
import numpy as np
import pytest

from padertorch_tpu.contrib.data.utils import check_audio_files_exist
from padertorch_tpu.contrib.je.data.utils import (
    DynamicExtendedBucketDataset, split_dataset)
from padertorch_tpu.contrib.ldrude import data as ldrude_data
from padertorch_tpu.data.dataset import from_list
from padertorch_tpu.data.database import DictDatabase


def test_check_audio_files_exist(tmp_path):
    wav = tmp_path / 'a.wav'
    wav.write_bytes(b'')
    db = {'datasets': {'train': {'ex': {
        'audio_path': {'observation': str(wav)},
        'num_samples': 100,
    }}}}
    check_audio_files_exist(db)
    check_audio_files_exist(db, speedup='thread')

    db['datasets']['train']['ex']['audio_path']['observation'] = (
        str(tmp_path / 'missing.wav'))
    with pytest.raises(AssertionError) as err:
        check_audio_files_exist(db)
    assert 'missing.wav' in str(err.value)

    with pytest.raises(AssertionError):
        check_audio_files_exist({'no_audio': 1})
    with pytest.raises(ValueError):
        check_audio_files_exist({'a': str(wav)}, speedup='process')


def _examples(specs):
    return [
        {'example_id': f'ex{i}', 'seq_len': length, 'dataset': dataset,
         'labels': np.asarray(labels)}
        for i, (length, dataset, labels) in enumerate(specs)
    ]


def test_extended_bucket_length_criterion_matches_plain_bucketing():
    examples = _examples([
        (100, 'a', [1, 0]), (102, 'a', [1, 0]),
        (500, 'a', [1, 0]), (505, 'a', [1, 0]),
    ])
    ds = DynamicExtendedBucketDataset(
        from_list(examples), batch_size=2, len_key='seq_len',
        max_padding_rate=0.1)
    batches = list(ds)
    assert sorted(len(b) for b in batches) == [2, 2]
    by_len = sorted(batches, key=lambda b: b[0]['seq_len'])
    assert {ex['seq_len'] for ex in by_len[0]} == {100, 102}
    assert {ex['seq_len'] for ex in by_len[1]} == {500, 505}


def test_extended_bucket_label_diversity():
    # All same length; with min_label_diversity=2 a bucket must keep a
    # slot free for a second class, so four class-0 examples cannot
    # fill a batch of 3 alone.
    examples = _examples([
        (100, 'a', [1, 0]), (100, 'a', [1, 0]), (100, 'a', [1, 0]),
        (100, 'a', [0, 1]),
    ])
    ds = DynamicExtendedBucketDataset(
        from_list(examples), batch_size=3, len_key='seq_len',
        max_padding_rate=0.1, min_label_diversity=2, label_key='labels')
    batches = list(ds)
    full = [b for b in batches if len(b) == 3]
    assert len(full) == 1
    classes = set()
    for ex in full[0]:
        classes.update(np.argwhere(ex['labels'] > 0).flatten().tolist())
    assert len(classes) >= 2


def test_extended_bucket_dataset_quota_and_bucket_id():
    examples = _examples([
        (100, 'a', [1]), (100, 'a', [1]), (100, 'a', [1]),
        (100, 'b', [1]),
    ])
    ds = DynamicExtendedBucketDataset(
        from_list(examples), batch_size=2, len_key='seq_len',
        max_padding_rate=0.1, min_dataset_examples={'a': 1, 'b': 1})
    full = [b for b in ds if len(b) == 2]
    # Every full batch satisfies the quota: one 'a' and one 'b', so at
    # most one full batch is possible here.
    assert all(
        {ex['dataset'] for ex in b} == {'a', 'b'} for b in full[:1])

    # bucket_id: examples with different 'dataset' never share a bucket
    ds = DynamicExtendedBucketDataset(
        from_list(examples), batch_size=2, len_key='seq_len',
        max_padding_rate=0.1, bucket_id='dataset')
    for batch in ds:
        assert len({ex['dataset'] for ex in batch}) == 1


def test_split_dataset_on_lazy_dataset():
    examples = [{'example_id': f'e{i}', 'v': i} for i in range(10)]
    tr, dv = split_dataset(from_list(examples), fold=0, nfolds=5, seed=0)
    tr, dv = list(tr), list(dv)
    assert len(tr) == 8 and len(dv) == 2
    ids = {ex['example_id'] for ex in tr} | {ex['example_id'] for ex in dv}
    assert len(ids) == 10


def test_ldrude_pipeline_shapes():
    rng = np.random.RandomState(0)
    K, samples = 2, 4000
    examples = {
        f'ex{i}': {
            'audio_data': {
                'speech_source': rng.randn(K, samples).astype(np.float32),
                'observation': rng.randn(samples).astype(np.float32),
            },
        }
        for i in range(2)
    }
    db = DictDatabase({'datasets': {'train': examples}})
    it = ldrude_data.prepare_iterable(
        db, 'train', batch_size=2, prefetch=False)
    batch = next(iter(it))
    Y = np.asarray(batch['Y'])
    assert Y.ndim == 3 and Y.shape[0] == 2  # (B, T, F)
    F = Y.shape[-1]
    assert F == 257
    mask = np.asarray(batch['target_mask'])
    assert mask.shape[:2] == Y.shape[:2] and mask.shape[-1] == F
    assert mask.shape[2] == K
    # IBM is one-hot over sources
    np.testing.assert_allclose(mask.sum(axis=2), 1.0)
    cpd = np.asarray(batch['cos_phase_difference'])
    assert cpd.shape == mask.shape
    assert np.all(np.abs(cpd) <= 1 + 1e-6)
    # return_keys selection
    out = ldrude_data.pre_batch_transform(
        examples['ex0'], return_keys=['Y_abs', 'num_frames'])
    assert set(out) == {'Y_abs', 'num_frames'}
