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


def test_dynamic_bucket_max_total_size():
    """Regression: max_total_size was accepted and silently dropped —
    batches must respect the padded-size cap max_len * n."""
    from padertorch_tpu.data.dataset import from_list

    exs = [{'n': 100} for _ in range(16)]
    ds = from_list(exs).batch_dynamic_time_series_bucket(
        batch_size=8, len_key='n', max_padding_rate=0.5,
        max_total_size=400)
    batches = list(ds)
    assert batches, 'no batches emitted'
    for b in batches:
        assert len(b) * max(ex['n'] for ex in b) <= 400, len(b)
    assert sum(len(b) for b in batches) == 16


def test_catch_drops_inner_chained_map_filter_exception():
    """Regression: .map(raises).map(ok).catch() — the OUTER map's fast
    path iterated the inner chain outside the try, so an inner
    FilterException killed the whole iteration instead of dropping the
    one example."""
    from padertorch_tpu.data.dataset import FilterException, from_list

    def maybe_drop(x):
        if x % 2:
            raise FilterException()
        return x

    ds = from_list(list(range(6))).map(maybe_drop).map(
        lambda x: x * 10).catch()
    assert list(ds) == [0, 20, 40]


def test_prefetch_sequential_honors_catch_filter_exception():
    """Regression: the sequential (non-indexable) prefetch path
    forwarded FilterException as a fatal error."""
    from padertorch_tpu.data.dataset import FilterException, from_list

    def maybe_drop(x):
        if x == 2:
            raise FilterException()
        return x

    # .filter() makes the source non-indexable -> sequential path
    ds = from_list(list(range(5))).filter(lambda x: x != 4) \
        .map(maybe_drop).prefetch(2, 3, catch_filter_exception=True)
    assert sorted(list(ds)) == [0, 1, 3]


def test_abandoned_prefetch_iterator_does_not_leak_reader():
    """Regression: breaking out of a sequential prefetch left the
    reader thread blocked forever on a full queue."""
    import threading
    import time
    from padertorch_tpu.data.dataset import from_list

    before = threading.active_count()
    ds = from_list(list(range(100))).filter(lambda x: True) \
        .prefetch(1, 2)
    it = iter(ds)
    next(it)
    it.close()                       # abandon mid-iteration
    deadline = time.time() + 5
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before, 'reader thread leaked'


def test_sliced_and_shuffled_keys_follow_iteration():
    """Regression: wrappers inherited the SOURCE's full key list, so
    zip(ds.keys(), ds) silently mislabeled examples after slicing."""
    import pytest
    from padertorch_tpu.data.dataset import from_dict

    ds = from_dict({f'k{i}': {'v': i} for i in range(10)})
    sliced = ds[2:5]
    assert sliced.keys() == ['k2', 'k3', 'k4']
    with pytest.raises(TypeError):
        ds.shuffle(reshuffle=True).keys()
    with pytest.raises(TypeError):
        ds.batch(2).keys()
