"""Evaluate the WaveNet vocoder: autoregressive synthesis + RMSE.

This is the consumer of the fast sampling path: on TPU the model's
``synthesize`` dispatches to the persistent-VMEM Pallas sampler
(``ops/pallas/wavenet.py``); on CPU it uses the jitted scan sampler.

Reference parity: ``contrib/examples/audio_synthesis/wavenet/evaluate.py``
(nv_wavenet synthesis, per-utterance squared error, global
``rmse = sqrt(sum(err) / sum(T))``, rmse.json sorted best-first, wav dumps
for the 10 best/worst utterances).

Run (synthetic smoke, after train.py --synthetic --small):
    python -m padertorch_tpu.contrib.examples.audio_synthesis.wavenet.evaluate \
        --model_path /path/to/storage_dir --synthetic
"""
import argparse
import json
from pathlib import Path

import numpy as np

from padertorch_tpu.evaluation import (
    split_managed, gather_merged, is_master,
)

from padertorch_tpu.contrib.examples._audio import write_wav

from . import data
from .model import WaveNetVocoder


import weakref

# weak-keyed so cached programs die with their model (no pinning);
# NOTE: the jitted closure captures the model's weights at trace time —
# reloading weights into the same model object requires a new object
# (the evaluate script loads each model exactly once)
_SYNTH_JIT_CACHE = weakref.WeakKeyDictionary()


def _jitted_infer(model, chunk_length, chunk_overlap, parallel):
    """One compiled XLA program per (model, synthesis configuration):
    the gather-based chunking (modules/wavenet) makes the whole chunked
    synthesis jittable — no per-chunk host dispatches (12x end-to-end
    on a remote-relay TPU backend, doc/performance.md)."""
    import jax
    per_model = _SYNTH_JIT_CACHE.setdefault(model, {})
    key = (chunk_length, chunk_overlap, parallel)
    if key not in per_model:
        per_model[key] = jax.jit(lambda c: model.wavenet.infer(
            c, chunk_length=chunk_length, chunk_overlap=chunk_overlap,
            parallel=parallel))
    return per_model[key]


def synthesize_example(model, example, chunk_length, chunk_overlap,
                       parallel=False):
    """AR synthesis for one example; returns (example_id, metrics, audio)."""
    features = np.asarray(example['features'])[None]  # (1, M, frames)
    target = np.asarray(example['audio_data'])

    estimate = np.asarray(_jitted_infer(
        model, chunk_length, chunk_overlap, parallel)(features))[0]
    # synthesis also reconstructs padded samples; they must be fewer than
    # one frame shift (the maximum pad width)
    n_extra = estimate.shape[-1] - target.shape[-1]
    assert -data.STFT_SHIFT < n_extra < data.STFT_SHIFT, (
        estimate.shape, target.shape)
    t = min(estimate.shape[-1], target.shape[-1])
    err = float(((estimate[:t] - target[:t]) ** 2).sum())
    return example['example_id'], {
        'squared_error': err,
        'num_samples': t,
        'rmse': float(np.sqrt(err / t)),
    }, estimate[:t]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--model_path', required=True)
    parser.add_argument('--database', default=None)
    parser.add_argument('--synthetic', action='store_true')
    parser.add_argument('--dataset', default='test_clean')
    parser.add_argument('--max_examples', type=int, default=None)
    parser.add_argument('--chunk_length', type=int, default=48_000)
    parser.add_argument('--chunk_overlap', type=int, default=16_000)
    parser.add_argument('--parallel', action='store_true',
                        help='batch-parallel chunked synthesis (all '
                             'chunks sample as one batch)')
    parser.add_argument('--num_synthetic_examples', type=int, default=4)
    parser.add_argument('--synthetic_samples', type=int, default=4000)
    parser.add_argument('--num_audio_dumps', type=int, default=10,
                        help='dump this many best + worst utterances as wav')
    args = parser.parse_args()

    model_path = Path(args.model_path)
    model = WaveNetVocoder.from_storage_dir(
        model_path, checkpoint_name='ckpt_best_loss.ptt')
    model = model.eval()

    if args.synthetic or args.database is None:
        dataset = data.synthetic_database(
            num_examples=args.num_synthetic_examples,
            num_samples=args.synthetic_samples, seed=2)
    else:
        from padertorch_tpu.data.database import JsonDatabase
        from padertorch_tpu.contrib.je.data.transforms import AudioReader
        reader = AudioReader(target_sample_rate=data.SAMPLE_RATE)
        dataset = JsonDatabase(args.database).get_dataset(
            args.dataset).map(reader)
    if args.max_examples is not None:
        dataset = list(dataset)[:args.max_examples]

    # spill synthesized audio to disk: only num_audio_dumps best/worst
    # are kept, and long eval sets would otherwise accumulate GBs in RAM
    import tempfile
    spill_dir = Path(tempfile.mkdtemp(prefix='wavenet_eval_'))
    results = {}
    for example in split_managed(dataset, progress_bar=True):
        example = data.extract_features(example)
        example_id, metrics, estimate = synthesize_example(
            model, example,
            chunk_length=args.chunk_length,
            chunk_overlap=args.chunk_overlap,
            parallel=args.parallel,
        )
        results[example_id] = metrics
        np.save(spill_dir / f'{example_id}.npy',
                estimate.astype('float32'))

    merged = gather_merged(results)
    if is_master():
        out_dir = model_path / 'eval'
        out_dir.mkdir(exist_ok=True)
        total_err = sum(m['squared_error'] for m in merged.values())
        total_t = sum(m['num_samples'] for m in merged.values())
        global_rmse = float(np.sqrt(total_err / total_t))
        by_rmse = sorted(merged.items(), key=lambda kv: kv[1]['rmse'])
        (out_dir / 'rmse.json').write_text(json.dumps(
            [(k, v['rmse']) for k, v in by_rmse], indent=2))
        summary = {
            'rmse': global_rmse,
            'num_examples': len(merged),
            'num_samples': total_t,
        }
        (out_dir / 'means.json').write_text(json.dumps(summary, indent=2))

        # dump best/worst audio (only those synthesized on this rank)
        audio_dir = out_dir / 'audio'
        audio_dir.mkdir(exist_ok=True)
        n = args.num_audio_dumps
        for example_id, _ in (by_rmse[:n] + by_rmse[-n:]):
            spilled = spill_dir / f'{example_id}.npy'
            if spilled.exists():
                write_wav(audio_dir / f'{example_id}.wav',
                          np.load(spilled), data.SAMPLE_RATE)
        print(json.dumps(summary, indent=2))
    import shutil
    shutil.rmtree(spill_dir, ignore_errors=True)


if __name__ == '__main__':
    main()
