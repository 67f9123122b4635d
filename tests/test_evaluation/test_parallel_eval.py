"""Multi-process evaluation fan-out: shard split + file-based gather.

Mirrors the semantics of the reference's ``dlp_mpi.split_managed`` +
``gather`` + ``nested_merge`` (``tasnet/evaluate.py:235-256``): N worker
processes each evaluate a strided shard and the master's merged means
must equal the single-process result.
"""
import json
import subprocess
import sys

import pytest

WORKER = '''
import json, os, sys
from padertorch_tpu.evaluation import split_managed, gather_merged, is_master
from padertorch_tpu.contrib.neumann.evaluation import compute_means

dataset = [
    {'example_id': f'utt_{i}', 'value': float(i), 'nested': {'sq': float(i * i)}}
    for i in range(10)
]
results = {}
for ex in split_managed(dataset):
    results[ex['example_id']] = {
        'value': ex['value'], 'nested': ex['nested'],
    }
merged = gather_merged(results)
if is_master():
    means = compute_means(merged)
    out = os.path.join(os.environ['PT_EVAL_DIR'], 'means.json')
    with open(out, 'w') as fh:
        json.dump({'n': len(merged), 'means': means}, fh)
'''


def _run_ranks(tmp_path, size):
    tmp_path.mkdir(parents=True, exist_ok=True)
    procs = []
    for rank in range(size):
        env = {
            **__import__('os').environ,
            'PT_EVAL_RANK': str(rank),
            'PT_EVAL_SIZE': str(size),
            'PT_EVAL_DIR': str(tmp_path),
            'JAX_PLATFORMS': 'cpu',
        }
        procs.append(subprocess.Popen(
            [sys.executable, '-c', WORKER], env=env))
    for p in procs:
        assert p.wait(timeout=120) == 0
    return json.loads((tmp_path / 'means.json').read_text())


@pytest.mark.parametrize('size', [1, 2])
def test_gather_merged_means_match_single_process(tmp_path, size):
    out = _run_ranks(tmp_path / f'run{size}', size)
    assert out['n'] == 10
    assert out['means']['value'] == pytest.approx(4.5)
    assert out['means']['nested']['sq'] == pytest.approx(28.5)


def test_two_process_equals_one_process(tmp_path):
    single = _run_ranks(tmp_path / 'single', 1)
    double = _run_ranks(tmp_path / 'double', 2)
    assert single == double


def test_four_process_equals_one_process(tmp_path):
    # more workers than examples-per-shard boundaries: 10 examples over
    # 4 strided shards (3/3/2/2) must still merge to the same means
    single = _run_ranks(tmp_path / 'single4', 1)
    quad = _run_ranks(tmp_path / 'quad', 4)
    assert single == quad


def _patched_env(monkeypatch, tmp_path, *, rank, size):
    from padertorch_tpu.evaluation import parallel
    monkeypatch.setattr(parallel, 'RANK', rank)
    monkeypatch.setattr(parallel, 'SIZE', size)
    monkeypatch.setenv('PT_EVAL_DIR', str(tmp_path))
    monkeypatch.setenv('PT_EVAL_RUN_ID', 'straggler')
    return parallel


def test_gather_times_out_on_dead_worker(tmp_path, monkeypatch):
    """A worker that died mid-run (its shard never appears) must surface
    as a TimeoutError naming the missing shard — the operational failure
    mode dlp_mpi handles via MPI aborts in the reference."""
    parallel = _patched_env(monkeypatch, tmp_path, rank=0, size=2)
    with pytest.raises(TimeoutError, match=r'rank1'):
        parallel.gather({'utt_0': 1.0}, tag='t', timeout=0.5)
    # the master's own shard must not poison a relaunch: a fresh gather
    # with the full worker set succeeds (rank0 rewrites its shard)
    (tmp_path / 'gather_straggler_t.rank1.json').write_text('{"utt_1": 2.0}')
    out = parallel.gather({'utt_0': 1.0}, tag='t', timeout=5.0)
    assert out == [{'utt_0': 1.0}, {'utt_1': 2.0}]


def test_gather_waits_for_straggler(tmp_path, monkeypatch):
    """A slow-but-alive worker: the master polls until the shard lands
    (written atomically tmp+rename, exactly like a real rank)."""
    import threading, time, os

    parallel = _patched_env(monkeypatch, tmp_path, rank=0, size=3)

    def late_worker(rank, delay):
        time.sleep(delay)
        shard = tmp_path / f'gather_straggler_s.rank{rank}.json'
        tmp = str(shard) + '.tmp'
        with open(tmp, 'w') as fh:
            json.dump({f'utt_{rank}': float(rank)}, fh)
        os.rename(tmp, shard)

    threads = [
        threading.Thread(target=late_worker, args=(1, 0.3)),
        threading.Thread(target=late_worker, args=(2, 0.8)),
    ]
    for t in threads:
        t.start()
    out = parallel.gather({'utt_0': 0.0}, tag='s', timeout=30.0)
    for t in threads:
        t.join()
    assert out == [{'utt_0': 0.0}, {'utt_1': 1.0}, {'utt_2': 2.0}]
    # consumed-on-success: shards are gone, a rerun cannot see them
    assert not list(tmp_path.glob('gather_straggler_s.rank*.json'))
