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


def test_utils():
    added, removed, modified, same, eq = dict_compare(
        {'a': 1, 'b': 2}, {'b': 3, 'c': 4})
    assert added == {'a'} and removed == {'c'}
    assert set(modified) == {'b'} and not eq

    name = get_experiment_name(
        {'factory': 'padertorch_tpu.models.bss.'
                    'PermutationInvariantTrainingModel'})
    assert name == 'PermutationInvariantTrainingModel/baseline'
