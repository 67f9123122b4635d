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
