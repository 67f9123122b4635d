"""Benchmark: PIT-BLSTM training throughput on one TPU chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The benchmark trains the flagship PIT BLSTM separator (F=257, 3x600
bidirectional LSTM, K=2 — the model of
``reference contrib/examples/source_separation/pit/model.py``) with the
fully fused jitted train step (forward + PIT losses + backward + global
norm clip + Adam) on synthetic 4-second utterances (T=500 frames of a
512/128 STFT at 16 kHz), batch 16.

``vs_baseline``: the reference publishes no throughput numbers
(SURVEY.md §6).  The baseline constant below is an estimate of the torch
reference on a V100 for this model/shape (cuDNN BLSTM bound, measured
analogues ~15-25 utt/s); BASELINE.json's target is >= 5x that.
"""
import json
import sys
import time

import numpy as np


def _log(msg, _t0=[None]):
    if _t0[0] is None:
        _t0[0] = time.perf_counter()
    print(f'[bench +{time.perf_counter() - _t0[0]:.0f}s] {msg}',
          file=sys.stderr, flush=True)

# Estimated PyTorch-on-GPU reference throughput for this model/shape.
REFERENCE_UTT_PER_SEC = 20.0

B, T, F, K = 16, 500, 257, 2


def main():
    import jax
    jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
    jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0)
    import jax.numpy as jnp
    import padertorch_tpu as pt
    from padertorch_tpu import random as ptrandom
    from padertorch_tpu.models.bss import PermutationInvariantTrainingModel
    from padertorch_tpu.module import partition
    from padertorch_tpu.train.trainer import Trainer
    import tempfile

    _log('init model (param init ops)...')
    ptrandom.seed(0)
    # TPU-tuned flagship config: bf16 gate matmuls (f32 accumulation and
    # carry) + the Pallas fused cell-scan kernel (custom VJP reuses stored
    # activations -> ~1.5x faster train step); see doc/performance.md.
    model = PermutationInvariantTrainingModel(
        F=F, recurrent_layers=3, units=600, K=K,
        compute_dtype='bfloat16')
    model.blstm.scan_unroll = 4   # used by the scan fallback only
    model.blstm.backend = 'pallas'
    _log('model initialized')

    rng = np.random.RandomState(0)
    batch = {
        'Y_abs': jnp.asarray(
            np.abs(rng.randn(B, T, F)).astype('float32')),
        'X_abs': jnp.asarray(
            np.abs(rng.randn(B, T, K, F)).astype('float32')),
        'cos_phase_difference': jnp.asarray(
            np.cos(rng.randn(B, T, K, F)).astype('float32')),
        'num_frames': jnp.asarray([T] * B),
    }

    _log('batch created; building trainer (optimizer init)...')
    with tempfile.TemporaryDirectory() as tmp:
        trainer = Trainer(
            model=model,
            storage_dir=tmp,
            optimizer=pt.Adam(gradient_clipping=10.0, lr=1e-3),
            loss_weights={'pit_mse_loss': 1.0, 'pit_ips_loss': 1.0},
        )
        trainer.iteration = 0
        params, static = partition(trainer.model)
        opt_states = trainer._opt_states
        loss_weights = trainer._loss_weight_arrays()
        step = trainer._get_fn('train', trainer._make_train_step)
        key = jax.random.PRNGKey(0)

        # compile + warmup
        _log('compiling fused train step...')
        out = step(params, static, opt_states, batch, key, loss_weights)
        params, static, opt_states = out[0], out[1], out[2]
        jax.block_until_ready(out[3])
        _log('compiled; timing steady state')

        n_steps = 20
        t0 = time.perf_counter()
        for i in range(n_steps):
            out = step(
                params, static, opt_states, batch,
                jax.random.fold_in(key, i), loss_weights)
            params, static, opt_states = out[0], out[1], out[2]
        jax.block_until_ready(out[3])
        elapsed = time.perf_counter() - t0

    utt_per_sec = B * n_steps / elapsed
    print(json.dumps({
        'metric': 'pit_blstm_train_utterances_per_sec_per_chip',
        'value': round(utt_per_sec, 2),
        'unit': 'utt/s (B=16, T=500, F=257, 3x600 BLSTM, fused train step)',
        'vs_baseline': round(utt_per_sec / REFERENCE_UTT_PER_SEC, 2),
    }))


if __name__ == '__main__':
    main()
