"""Dataset pipeline tests (the lazy_dataset replacement)."""
import numpy as np
import pytest

from padertorch_tpu.data import dataset as lazy
from padertorch_tpu.data.dataset import FilterException


def ds():
    return lazy.from_dict({
        f'ex_{i}': {'example_id': f'ex_{i}', 'value': i} for i in range(10)
    })


def test_iteration_and_len():
    d = ds()
    assert len(d) == 10
    assert [e['value'] for e in d] == list(range(10))
    # re-iterable
    assert [e['value'] for e in d] == list(range(10))


def test_key_and_index_access():
    d = ds()
    assert d['ex_3']['value'] == 3
    assert d[4]['value'] == 4
    assert [e['value'] for e in d[2:5]] == [2, 3, 4]
    assert [e['value'] for e in d[[1, 5]]] == [1, 5]


def test_immutable_warranty():
    d = ds()

    def mutate(ex):
        ex['value'] = ex['value'] + 100
        return ex

    m = d.map(mutate)
    assert [e['value'] for e in m] == [100 + i for i in range(10)]
    # second epoch must not double-mutate
    assert [e['value'] for e in m] == [100 + i for i in range(10)]


def test_map_filter_catch_unbatch():
    d = ds()

    def drop_odd(ex):
        if ex['value'] % 2:
            raise FilterException()
        return ex

    assert [e['value'] for e in d.map(drop_odd).catch()] == [0, 2, 4, 6, 8]
    assert [e['value'] for e in d.filter(lambda e: e['value'] < 3)] \
        == [0, 1, 2]

    def explode(ex):
        return [dict(ex, part=p) for p in range(2)]

    flat = list(d.map(explode).unbatch())
    assert len(flat) == 20


def test_shuffle_reshuffles_per_epoch():
    d = ds().shuffle(reshuffle=True)
    e1 = [e['value'] for e in d]
    e2 = [e['value'] for e in d]
    assert sorted(e1) == list(range(10))
    assert e1 != list(range(10)) or e2 != list(range(10))


def test_batch_and_sort():
    d = ds().batch(3)
    batches = list(d)
    assert [len(b) for b in batches] == [3, 3, 3, 1]
    assert len(d) == 4
    d2 = ds().batch(3, drop_last=True)
    assert [len(b) for b in list(d2)] == [3, 3, 3]
    s = ds().sort(key_fn=lambda e: -e['value'])
    assert [e['value'] for e in s][:3] == [9, 8, 7]


def test_dynamic_bucket_batching():
    examples = [
        {'num_samples': n} for n in [100, 102, 500, 98, 505, 101, 510]
    ]
    d = lazy.from_list(examples).batch_dynamic_time_series_bucket(
        batch_size=3, len_key='num_samples', max_padding_rate=0.1)
    batches = list(d)
    for batch in batches:
        lens = [e['num_samples'] for e in batch]
        assert min(lens) >= max(lens) * 0.9, lens
    total = sum(len(b) for b in batches)
    assert total == len(examples)


def test_prefetch_preserves_order_and_catches():
    d = ds()

    def slow_drop(ex):
        import time
        time.sleep(0.001 * (10 - ex['value']))
        if ex['value'] == 5:
            raise FilterException()
        return ex

    out = [e['value'] for e in d.map(slow_drop).prefetch(
        4, 8, catch_filter_exception=True)]
    assert out == [0, 1, 2, 3, 4, 6, 7, 8, 9]


def test_concat_and_tile():
    d = ds() + ds()
    assert len(d) == 20
    assert d[15]['value'] == 5
    t = ds().tile(3)
    assert len(t) == 30
