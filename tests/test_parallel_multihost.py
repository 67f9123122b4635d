"""Real 2-process ``jax.distributed`` training test (CPU backend).

Spawns two worker processes (2 local virtual CPU devices each -> 4 global
devices) that train the PIT model data-parallel through the full Trainer
and proves:

- the loss trajectory equals the single-process 4-device run (DP over a
  multi-controller mesh is semantically invisible),
- exactly ONE process writes checkpoints / tfevents / ranking files,
- resume reads the checkpoint on process 0 and broadcasts the bytes,
- ``Configurable.from_file(consider_mpi=True)`` works when only process 0
  can see the config file,
- ``get_new_subdir(consider_mpi=True)`` yields one shared directory.

Reference analog: MPI-aware IO (``padertorch/base.py:152-165``,
``padertorch/io.py:60-66``) and the MPI evaluation scripts.
"""
import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

HERE = Path(__file__).parent
WORKER = HERE / 'multihost_worker.py'


def _free_port():
    with socket.socket() as s:
        s.bind(('localhost', 0))
        return s.getsockname()[1]


def _worker_env(n_local_devices):
    env = dict(os.environ)
    # the remote-TPU sitecustomize hook (PYTHONPATH .axon_site entry)
    # initialises the XLA backend at interpreter start, which breaks
    # jax.distributed.initialize — strip it like conftest.py does
    env.pop('PALLAS_AXON_POOL_IPS', None)
    env.pop('PALLAS_AXON_REMOTE_COMPILE', None)
    flags = [
        f for f in env.get('XLA_FLAGS', '').split()
        if not f.startswith('--xla_force_host_platform_device_count')
    ]
    flags.append(
        f'--xla_force_host_platform_device_count={n_local_devices}')
    env['XLA_FLAGS'] = ' '.join(flags)
    env['JAX_PLATFORMS'] = 'cpu'
    repo = str(HERE.parent)
    env['PYTHONPATH'] = os.pathsep.join(
        [repo] + [p for p in env.get('PYTHONPATH', '').split(os.pathsep)
                  if p and '.axon_site' not in p])
    return env


def _run_workers(num_processes, n_local_devices, tmp):
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(port), str(i),
             str(num_processes), str(tmp)],
            env=_worker_env(n_local_devices),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(num_processes)
    ]
    outputs = []
    for i, proc in enumerate(procs):
        try:
            out, _ = proc.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for p in procs:
                p.kill()
            raise
        outputs.append(out)
        assert proc.returncode == 0, (
            f'worker {i} failed (rc={proc.returncode}):\n{out}')
    return outputs


@pytest.fixture(scope='module')
def runs(tmp_path_factory):
    """One expensive spawn, shared by the assertions below."""
    multi_tmp = tmp_path_factory.mktemp('multihost')
    single_tmp = tmp_path_factory.mktemp('singlehost')
    _run_workers(2, 2, multi_tmp)
    _run_workers(1, 4, single_tmp)
    results = {
        'multi': [
            json.loads((multi_tmp / f'result_p{i}.json').read_text())
            for i in range(2)
        ],
        'single': json.loads(
            (single_tmp / 'result_p0.json').read_text()),
        'multi_tmp': multi_tmp,
        'single_tmp': single_tmp,
    }
    return results


def test_two_process_trajectory_equals_single_process(runs):
    """DP trajectory equality: 2 procs x 2 devices == 1 proc x 4 devices."""
    multi0 = runs['multi'][0]['losses']
    multi1 = runs['multi'][1]['losses']
    single = runs['single']['losses']
    assert len(single) == 4, single
    # the SPMD program returns the identical replicated loss everywhere
    np.testing.assert_array_equal(multi0, multi1)
    # different process layouts of the same global computation: tiny
    # float divergence from collective reduction order is allowed
    np.testing.assert_allclose(multi0, single, rtol=1e-5, atol=1e-6)


def test_exactly_one_writer(runs):
    tmp = runs['multi_tmp']
    # checkpoint writes: process 0 only
    p0_log = tmp / 'writes_p0.log'
    p1_log = tmp / 'writes_p1.log'
    assert p0_log.exists() and p0_log.read_text().strip(), \
        'process 0 wrote no checkpoints'
    assert not p1_log.exists(), (
        'process 1 wrote checkpoints:\n' + p1_log.read_text())
    # tfevents: exactly one writer produced event files
    events = list((tmp / 'storage').glob('events.out.tfevents.*'))
    assert len(events) == 1, events


def test_checkpoint_layout_and_resume(runs):
    tmp = runs['multi_tmp']
    ckpt_dir = tmp / 'storage' / 'checkpoints'
    names = sorted(p.name for p in ckpt_dir.iterdir())
    assert 'ckpt_latest.ptt' in names, names
    assert any(n.startswith('ckpt_4') for n in names), names
    for r in runs['multi']:
        assert r['resume_iteration'] == 4, r


def test_broadcast_io(runs):
    for r in runs['multi']:
        assert r['from_file_broadcast'] is True
    # one shared experiment dir
    subdirs = {r['subdir'] for r in runs['multi']}
    assert len(subdirs) == 1, subdirs
