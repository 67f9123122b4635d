"""Tests for contrib/jensheit base/batch/data/utils (reference
``padertorch/contrib/jensheit/{base,batch,data,utils}.py``)."""
import numpy as np
import pytest

from padertorch_tpu.contrib.jensheit.base import (
    BuildingBlock, Parameterized)
from padertorch_tpu.contrib.jensheit.batch import Padder
from padertorch_tpu.contrib.jensheit.data import (
    MaskTransformer, SequenceProvider, biased_binary_mask)
from padertorch_tpu.contrib.jensheit.mask_estimator import MaskKeys as M_K
from padertorch_tpu.contrib.jensheit.utils import (
    dict_compare, get_experiment_name)
from padertorch_tpu.data.dataset import from_list
from padertorch_tpu.ops import STFT


def test_parameterized_opts_and_config():
    from dataclasses import dataclass

    class Block(Parameterized):
        @dataclass
        class opts:
            units: int = 64
            name: str = 'x'

    b = Block(units=32)
    assert b.opts.units == 32 and b.opts.name == 'x'
    config = Block.get_config({})
    assert config['units'] == 64

    b2 = Block(opts=Block.opts(units=8))
    assert b2.opts.units == 8
    assert 'Block' in repr(b2)


def test_building_block_build_called():
    from dataclasses import dataclass

    class Block(BuildingBlock):
        @dataclass
        class opts:
            units: int = 4

        def build(self):
            self.built_with = self.opts.units

    assert Block(units=3).built_with == 3


def test_padder_sort_and_pad():
    batch = [
        {'x': np.ones((2, 5)), 'num_samples': 5, 'id': 'b'},
        {'x': np.ones((2, 7)), 'num_samples': 7, 'id': 'a'},
    ]
    padder = Padder(sort_by_key='num_samples', padding=True)
    out = padder(batch)
    assert out['x'].shape == (2, 2, 7)       # padded to longest
    np.testing.assert_array_equal(
        out['num_samples'], [7, 5])          # sorted descending
    assert out['x'][1, :, 5:].sum() == 0     # zero padding

    collate_only = Padder(padding=False)
    out2 = collate_only(batch)
    assert isinstance(out2['x'], list) and len(out2['x']) == 2


def test_biased_binary_mask():
    t, f = 10, 32
    rng = np.random.RandomState(0)
    speech = rng.randn(t, f) + 1j * rng.randn(t, f)
    noise = 1e-3 * (rng.randn(t, f) + 1j * rng.randn(t, f))
    target, noise_mask = biased_binary_mask(
        np.stack([speech, noise]), low_cut=2, high_cut=-2)
    assert target.shape == (t, f)
    # strong speech everywhere except the frequency guards
    assert target[:, 2:-2].mean() > 0.9
    assert (target[:, :2] == 0).all() and (noise_mask[:, :2] == 1).all()
    assert (target[:, -2:] == 0).all()
    # masks are complementary
    np.testing.assert_array_equal(target + noise_mask, np.ones((t, f)))


def test_mask_transformer():
    stft = STFT(shift=64, size=256, fading=None)
    mt = MaskTransformer(stft=stft, low_cut=2, high_cut=-2)
    n = 1000
    rng = np.random.RandomState(1)
    ex = {
        'observation': rng.randn(n).astype(np.float32),
        'speech_image': rng.randn(n).astype(np.float32),
        'noise_image': 0.01 * rng.randn(n).astype(np.float32),
    }
    out = mt(dict(ex))
    assert out[M_K.OBSERVATION_ABS].dtype == np.float32
    assert out['num_frames'] == out[M_K.OBSERVATION_STFT].shape[-2]
    assert out[M_K.SPEECH_MASK_TARGET].shape \
        == out[M_K.OBSERVATION_STFT].shape
    # list input maps over examples
    outs = mt([dict(ex), dict(ex)])
    assert len(outs) == 2


class _FakeDatabase:
    def __init__(self, examples):
        self._examples = examples

    def get_dataset(self, name):
        return from_list(self._examples)


@pytest.mark.parametrize('time_segments', [None, 400])
def test_sequence_provider(time_segments):
    rng = np.random.RandomState(0)
    examples = [
        {
            'example_id': f'ex{i}',
            'observation': rng.randn(2, 1000 + 100 * i).astype(
                np.float32),
            'num_samples': 1000 + 100 * i,
        }
        for i in range(4)
    ]
    provider = SequenceProvider(
        database=_FakeDatabase(examples),
        collate=Padder(sort_by_key='num_samples', padding=True),
        batch_size=2, shuffle=False, num_workers=1,
        time_segments=time_segments,
    )
    batches = list(provider.get_train_iterator())
    assert len(batches) >= 1
    first = batches[0]
    assert 'observation' in first and 'example_id' in first
    if time_segments:
        assert first['observation'].shape[-1] == time_segments
    else:
        # padded to the longest in the batch
        assert first['observation'].shape[-1] == max(
            first['num_samples'])
    eval_batches = list(provider.get_eval_iterator())
    assert len(eval_batches) >= 1


def _provider(**kwargs):
    return SequenceProvider(
        database=_FakeDatabase([]),
        collate=Padder(padding=False),
        num_workers=1, **kwargs)


def test_segment_golden():
    """Pins the reference segmentation semantics: non-overlapping
    time_segments chunks, tail cut, contents exactly the strided
    slices, non-audio fields shared, NUM_SAMPLES rewritten."""
    import random
    provider = _provider(time_segments=300, shuffle=False)
    rng = np.random.RandomState(7)
    obs = rng.randn(2, 1000).astype(np.float32)
    example = {
        'example_id': 'ex0', 'observation': obs,
        'audio_keys': ['observation'], 'num_samples': 1000,
    }
    random.seed(0)
    out = provider.segment(dict(example))
    assert len(out) == 3                      # floor(1000 / 300)
    assert all(o['num_samples'] == 300 for o in out)
    assert all(o['example_id'] == 'ex0' for o in out)
    got = sorted((o['observation'] for o in out),
                 key=lambda a: float(a.sum()))
    want = sorted((obs[:, i * 300:(i + 1) * 300] for i in range(3)),
                  key=lambda a: float(a.sum()))
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)

    # random offset: all chunks still seg_len, count can drop by one
    provider2 = _provider(time_segments=300, shuffle=False,
                          time_segments_random_offset=True)
    np.random.seed(3)
    out2 = provider2.segment(dict(example))
    assert len(out2) in (2, 3)
    assert all(o['observation'].shape == (2, 300) for o in out2)

    # too short -> FilterException (filtered by the pipeline)
    from padertorch_tpu.data.dataset import FilterException
    short = {
        'example_id': 's', 'observation': obs[:, :100],
        'audio_keys': ['observation'], 'num_samples': 100,
    }
    with pytest.raises(FilterException):
        provider.segment(short)

    # exclude_keys accepts a bare string and skips that key
    ex2 = dict(example, speech_image=obs.copy(),
               audio_keys=['observation', 'speech_image'])
    out3 = provider.segment(ex2, exclude_keys='speech_image')
    assert all(o['speech_image'].shape == (2, 1000) for o in out3)
    assert all(o['observation'].shape == (2, 300) for o in out3)


def test_segment_channels_golden():
    """Pins the per-channel fan-out: every ndarray is reduced to a
    singleton channel axis, channels-last arrays are transposed first,
    wrong-shaped arrays raise."""
    provider = _provider(segment_channels=True)
    rng = np.random.RandomState(8)
    obs = rng.randn(3, 50).astype(np.float32)        # (C, T)
    mask = rng.rand(50, 3).astype(np.float32)        # (T, C) (< C first)
    example = {
        'example_id': 'e', 'observation': obs, 'mask': mask,
        'num_samples': 50,
    }
    out = provider.segment_channels(dict(example))
    assert len(out) == 3
    for o in out:
        assert o['observation'].shape == (1, 50)
        assert o['mask'].shape == (1, 50)
        assert o['example_id'] == 'e'
    got = sorted(float(o['observation'].sum()) for o in out)
    want = sorted(float(obs[c].sum()) for c in range(3))
    np.testing.assert_allclose(got, want)
    # channel pairing survives the fan-out: mask channel matches obs
    for o in out:
        c = next(i for i in range(3)
                 if np.array_equal(o['observation'][0], obs[i]))
        np.testing.assert_array_equal(o['mask'][0], mask[:, c])

    # list input fans out each element
    out2 = provider.segment_channels([dict(example), dict(example)])
    assert len(out2) == 6

    bad = dict(example, mask=rng.rand(7, 9).astype(np.float32))
    with pytest.raises(ValueError, match='channels'):
        provider.segment_channels(bad)


def test_utils():
    added, removed, modified, same, eq = dict_compare(
        {'a': 1, 'b': 2}, {'b': 3, 'c': 4})
    assert added == {'a'} and removed == {'c'}
    assert set(modified) == {'b'} and not eq

    name = get_experiment_name(
        {'factory': 'padertorch_tpu.models.bss.'
                    'PermutationInvariantTrainingModel'})
    assert name == 'PermutationInvariantTrainingModel/baseline'


def test_train_iterator_per_call_time_segment():
    """Regression: ``get_train_iterator(time_segment=...)`` must
    actually segment with the per-call length (it used to enable the
    fan-out but drop the value, crashing on ``seg_len=None``)."""
    rng = np.random.RandomState(0)
    examples = [
        {
            'example_id': f'ex{i}',
            'observation': rng.randn(2, 1000).astype(np.float32),
            'num_samples': 1000,
        }
        for i in range(2)
    ]
    provider = SequenceProvider(
        database=_FakeDatabase(examples),
        collate=Padder(sort_by_key='num_samples', padding=True),
        batch_size=2, shuffle=False, num_workers=1,
    )
    batches = list(provider.get_train_iterator(time_segment=300))
    assert batches, 'segmented iterator yielded nothing'
    assert batches[0]['observation'].shape[-1] == 300


def test_fan_out_all_keys_excluded_is_filter_exception():
    """Regression: excluding every array key from segment_channels (or
    every audio key from segment) must raise a catchable
    FilterException, not leak a bare StopIteration out of _fan_out
    (PEP 479 turns that into RuntimeError inside generator pipelines,
    or silently truncates iteration)."""
    import pytest
    from padertorch_tpu.data.dataset import FilterException

    provider = _provider(time_segments=300, shuffle=False)
    ex = {
        'example_id': 'e0',
        'observation': np.zeros((2, 900), np.float32),
        'num_samples': 900,
        'audio_keys': ['observation'],
    }
    with pytest.raises(FilterException):
        provider.segment(dict(ex), exclude_keys=['observation'])
    with pytest.raises(FilterException):
        provider.segment_channels(
            dict(ex), exclude_keys=['observation'])
