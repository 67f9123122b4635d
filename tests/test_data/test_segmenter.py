"""Segmenter tests (reference: tests/test_data/test_segmenter.py)."""
import numpy as np
import pytest

from padertorch_tpu.data.dataset import FilterException
from padertorch_tpu.data.segment import (
    Segmenter, get_anchor, get_segment_boundaries, segment,
)


def test_basic_segmentation():
    segmenter = Segmenter(length=32000, shift=16000,
                          include_keys=('x', 'y'))
    ex = {'x': np.arange(65000), 'y': np.arange(65000),
          'num_samples': 65000, 'gender': 'm'}
    out = segmenter(ex)
    assert len(out) == 3
    for i, e in enumerate(out):
        np.testing.assert_array_equal(
            e['x'], np.arange(i * 16000, i * 16000 + 32000))
        np.testing.assert_array_equal(e['x'], e['y'])
        assert e['gender'] == 'm'
        assert e['segment_start'] == i * 16000
        assert e['segment_stop'] == i * 16000 + 32000


def test_too_short_raises_filter_exception():
    segmenter = Segmenter(length=32000, include_keys='x')
    with pytest.raises(FilterException):
        segmenter({'x': np.arange(1000)})


def test_disabled_segmentation():
    segmenter = Segmenter(length=-1, include_keys=('x',))
    out = segmenter({'x': np.arange(100), 'meta': 1})
    assert len(out) == 1
    assert out[0]['segment_stop'] == 100
    assert out[0]['meta'] == 1


def test_axis_and_nested_keys():
    segmenter = Segmenter(length=10, include_keys=('a',), axis=-1)
    ex = {'a': {'b': np.arange(25).reshape(1, 25)}, 'c': 'copy'}
    out = segmenter(ex)
    assert len(out) == 2
    assert out[0]['a']['b'].shape == (1, 10)
    assert out[1]['c'] == 'copy'


def test_anchor_modes():
    np.random.seed(3)
    assert get_anchor(24, 10, 3, mode='left') == 0
    assert get_anchor(24, 10, 3, mode='right') == 14
    assert get_anchor(24, 10, 3, mode='center') == 12
    assert get_anchor(24, 10, 3, mode='centered_cutout') == 1
    a = get_anchor(24, 10, 3, mode='random')
    assert 0 <= a <= 14
    with pytest.raises(ValueError):
        get_anchor(24, 10, 3, mode='bogus')


def test_boundaries():
    b = get_segment_boundaries(24, 10, 3, anchor='left')
    np.testing.assert_array_equal(b[:, 0], [0, 3, 6, 9, 12])
    np.testing.assert_array_equal(b[:, 1], [10, 13, 16, 19, 22])
    b = get_segment_boundaries(24, 10, 3, anchor='right')
    np.testing.assert_array_equal(b[:, 0], [2, 5, 8, 11, 14])


def test_segment_function_modes():
    x = np.arange(16000)
    for mode in ['constant', 'max', 'min']:
        out = segment(x, 950, mode=mode)
        assert out.ndim == 2
        assert out.shape[0] >= 16
    # padding mode covers the tail
    out = segment(np.arange(25), 10, 10, anchor='left', padding=True)
    assert out.shape == (3, 10)
    assert out[2, -1] == 0  # zero padded


def test_random_anchor_with_rng():
    segmenter = Segmenter(length=10, shift=10, include_keys='x',
                          anchor='random')
    rng = np.random.RandomState(0)
    out = segmenter({'x': np.arange(35)}, rng=rng)
    assert all(e['x'].shape == (10,) for e in out)


def test_max_mode_shrinks_for_short_utterances():
    """Regression: mode='max' deliberately skips the too-short
    FilterException (the mode SHRINKS the segment length instead), but
    a leading assert in get_segment_boundaries crashed with a bare
    AssertionError before the adaptation could run."""
    import pytest
    from padertorch_tpu.data.dataset import FilterException
    from padertorch_tpu.data.segment import Segmenter

    seg = Segmenter(length=32000, shift=16000, mode='max',
                    include_keys=('x',))
    out = seg({'x': np.arange(20000, dtype=np.float32),
               'num_samples': 20000})
    # one segment covering (most of) the utterance, length <= 20000
    assert len(out) >= 1
    assert out[0]['x'].shape[-1] <= 20000
    # shorter than the overlap: no valid segmentation -> FilterException
    with pytest.raises(FilterException):
        seg({'x': np.arange(10000, dtype=np.float32),
             'num_samples': 10000})


def test_random_max_segments_uses_passed_rng():
    """Regression: the final anchor draw used global np.random instead
    of the passed rng — seeded segmentation was not reproducible."""
    from padertorch_tpu.data.segment import get_anchor

    a = get_anchor(10000, 1000, 500, mode='random_max_segments',
                   rng=np.random.RandomState(3))
    np.random.seed(0)          # must NOT influence the draw
    b = get_anchor(10000, 1000, 500, mode='random_max_segments',
                   rng=np.random.RandomState(3))
    assert a == b
