"""Worker for the 2-process ``jax.distributed`` tests.

Launched as a subprocess by ``tests/test_parallel_multihost.py``::

    python multihost_worker.py <port> <process_id> <num_processes> <tmpdir>

Each process gets ``--xla_force_host_platform_device_count`` local CPU
devices (set by the parent); together they form one global device set.
With ``num_processes == 1`` the same code is the single-process reference
run (no ``jax.distributed``), so the parent can compare the multi-process
loss trajectory against it.

Reference analog: the MPI training/eval scripts of the reference, e.g.
``padertorch/contrib/examples/source_separation/tasnet/evaluate.py:159-236``
(rank-0-gated IO + broadcast).
"""
import json
import sys
from pathlib import Path

import numpy as np

GLOBAL_BATCH = 8
T, F, K = 10, 9, 2
ITERATIONS_PER_EPOCH = 2
EPOCHS = 2


def make_local_batches(process_id, num_processes):
    """Deterministic global batches; each process takes its row slice.

    The data pipeline contract of multi-controller training: every
    process produces the LOCAL slice of the global batch
    (global batch = per-process batch x num processes).
    """
    rng = np.random.RandomState(7)
    per = GLOBAL_BATCH // num_processes
    lo, hi = process_id * per, (process_id + 1) * per
    batches = []
    for _ in range(ITERATIONS_PER_EPOCH):
        ex = {
            'Y_abs': np.abs(rng.randn(GLOBAL_BATCH, T, F)
                            ).astype('float32'),
            'X_abs': np.abs(rng.randn(GLOBAL_BATCH, T, K, F)
                            ).astype('float32'),
            'cos_phase_difference': np.cos(
                rng.randn(GLOBAL_BATCH, T, K, F)).astype('float32'),
            'num_frames': np.full((GLOBAL_BATCH,), T, dtype='int64'),
        }
        batches.append({k: v[lo:hi] for k, v in ex.items()})
    return batches


def main():
    port, process_id, num_processes = map(int, sys.argv[1:4])
    tmp = Path(sys.argv[4])

    # NOTHING may touch the XLA backend before jax.distributed.initialize
    # — so all padertorch_tpu imports live below this call.
    import jax
    if num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=f'localhost:{port}',
            num_processes=num_processes,
            process_id=process_id,
        )
        assert jax.process_count() == num_processes, jax.process_count()

    import padertorch_tpu as pt
    from padertorch_tpu.train.hooks import Hook

    class LossRecorder(Hook):
        """Records the per-step loss (fully-replicated device scalar)."""

        uid = 'LossRecorder'

        def __init__(self):
            self.losses = []

        def post_step(self, trainer, example, model_output, review):
            self.losses.append(review['scalars']['loss'])
    from padertorch_tpu import random as ptrandom
    from padertorch_tpu.models.bss import PermutationInvariantTrainingModel
    from padertorch_tpu.parallel import (
        DataParallel, make_mesh, replicate, multihost)
    from padertorch_tpu.train.trainer import Trainer

    # -- instrument checkpoint writes: prove exactly one process writes --
    writes_log = tmp / f'writes_p{process_id}.log'
    orig_write = Trainer._write_checkpoint

    def logged_write(self, state, path, iteration):
        with writes_log.open('a') as f:
            f.write(f'{Path(path).name}\n')
        return orig_write(self, state, path, iteration)

    Trainer._write_checkpoint = logged_write

    ptrandom.seed(0)
    model = PermutationInvariantTrainingModel(
        F=F, recurrent_layers=1, units=8, K=K).train()
    mesh = make_mesh()
    dp = DataParallel(mesh)
    model = replicate(model, mesh)

    storage = tmp / 'storage'
    trainer = Trainer(
        model=model,
        storage_dir=storage,
        optimizer=pt.Adam(gradient_clipping=10.0, lr=1e-3),
        loss_weights={'pit_mse_loss': 1.0, 'pit_ips_loss': 1.0},
        summary_trigger=(1, 'epoch'),
        checkpoint_trigger=(1, 'epoch'),
        stop_trigger=(EPOCHS, 'epoch'),
        sharding=dp,
    )
    recorder = LossRecorder()
    trainer.register_hook(recorder)

    batches = make_local_batches(process_id, num_processes)
    trainer.train(batches)

    losses = [float(np.asarray(x)) for x in recorder.losses]
    assert all(np.isfinite(losses)), losses
    expected_final_it = EPOCHS * ITERATIONS_PER_EPOCH
    assert trainer.iteration == expected_final_it, trainer.iteration

    result = {
        'process_id': process_id,
        'losses': losses,
        'final_iteration': trainer.iteration,
    }

    if num_processes > 1:
        # losses must be identical across processes (same SPMD program)
        all_losses = multihost.broadcast_obj(
            losses if multihost.is_primary() else None)
        assert np.allclose(all_losses, losses, rtol=0, atol=0), (
            all_losses, losses)

        # -- resume via broadcast: process 0 reads, workers get bytes --
        ptrandom.seed(0)
        model2 = PermutationInvariantTrainingModel(
            F=F, recurrent_layers=1, units=8, K=K).train()
        trainer2 = Trainer(
            model=replicate(model2, mesh),
            storage_dir=storage,
            optimizer=pt.Adam(gradient_clipping=10.0, lr=1e-3),
            loss_weights={'pit_mse_loss': 1.0, 'pit_ips_loss': 1.0},
            summary_trigger=(1, 'epoch'),
            checkpoint_trigger=(1, 'epoch'),
            stop_trigger=(EPOCHS, 'epoch'),
            sharding=dp,
        )
        trainer2.load_checkpoint()
        assert trainer2.iteration == expected_final_it, trainer2.iteration
        result['resume_iteration'] = trainer2.iteration

        # -- Configurable.from_file(consider_mpi=True): workers must NOT
        # need the file (process 1 passes a nonexistent path; the bytes
        # come from process 0's broadcast) --
        from padertorch_tpu.configurable import Configurable
        from padertorch_tpu.train.optimizer import Adam
        cfg_path = tmp / 'config_only_p0.json'
        if multihost.is_primary():
            cfg_path.write_text(json.dumps({
                'factory': 'padertorch_tpu.train.optimizer.Adam',
                'lr': 0.125,
                'gradient_clipping': 1.0,
            }))
        multihost.barrier('config_written')
        load_path = cfg_path if multihost.is_primary() \
            else tmp / 'does_not_exist.json'
        assert multihost.is_primary() or not load_path.exists()
        opt = Configurable.from_file(load_path, consider_mpi=True)
        assert isinstance(opt, Adam), opt
        assert opt.optimizer_kwargs['learning_rate'] == 0.125, \
            opt.optimizer_kwargs
        result['from_file_broadcast'] = True

        # -- get_new_subdir(consider_mpi=True): ONE directory for all --
        from padertorch_tpu.io import get_new_subdir
        sub = get_new_subdir(tmp / 'exp', consider_mpi=True)
        sub0 = multihost.broadcast_obj(
            str(sub) if multihost.is_primary() else None)
        assert str(sub) == sub0, (str(sub), sub0)
        result['subdir'] = str(sub)

        multihost.barrier('done')

    (tmp / f'result_p{process_id}.json').write_text(json.dumps(result))
    print(f'worker {process_id}: OK', flush=True)


if __name__ == '__main__':
    main()
