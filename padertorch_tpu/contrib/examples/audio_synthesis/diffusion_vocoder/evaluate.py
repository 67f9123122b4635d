"""Evaluate the diffusion vocoder: reverse-process synthesis.

The whole reverse process (DDPM ancestral or strided deterministic
DDIM) runs as ONE ``lax.scan`` — a 50-network-call synthesis is a
single jitted program.  Metrics: per-utterance multi-resolution STFT
loss and RMSE (same contract as the GAN vocoder evaluate), wav dumps
of the best/worst utterances.

Run (synthetic smoke, after train.py --synthetic --small):
    python -m padertorch_tpu.contrib.examples.audio_synthesis.\
diffusion_vocoder.evaluate --model_path /path/to/storage_dir --synthetic
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
from .model import DiffusionVocoder


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--model_path', required=True)
    parser.add_argument('--database', default=None)
    parser.add_argument('--synthetic', action='store_true')
    parser.add_argument('--dataset', default='test_clean')
    parser.add_argument('--max_examples', type=int, default=None)
    parser.add_argument('--num_synthetic_examples', type=int, default=4)
    parser.add_argument('--synthetic_samples', type=int, default=4000)
    parser.add_argument('--num_audio_dumps', type=int, default=10)
    parser.add_argument('--ddim_steps', type=int, default=None,
                        help='use DDIM with this many steps '
                             '(default: full ancestral DDPM)')
    args = parser.parse_args()

    model_path = Path(args.model_path)
    model = DiffusionVocoder.from_storage_dir(
        model_path, checkpoint_name='ckpt_best_loss.ptt')
    model = model.eval()

    import jax
    from padertorch_tpu.ops.losses.stft import multi_resolution_stft_loss

    @jax.jit
    def synthesize(features, key):
        if args.ddim_steps is not None:
            return model.synthesize(
                features, key=key, ddim=True,
                num_steps=args.ddim_steps)
        return model.synthesize(features, key=key)

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

    import tempfile
    spill_dir = Path(tempfile.mkdtemp(prefix='diffusion_vocoder_eval_'))
    results = {}
    for i, example in enumerate(split_managed(dataset, progress_bar=True)):
        example = data.extract_features(example)
        features = np.asarray(example['features'])[None]
        target = np.asarray(example['audio_data'])
        estimate = np.asarray(synthesize(
            features, jax.random.PRNGKey(i)))[0]
        t = min(estimate.shape[-1], target.shape[-1])
        estimate, target = estimate[:t], target[:t]
        err = float(((estimate - target) ** 2).sum())
        stft_loss = float(multi_resolution_stft_loss(
            estimate[None], target[None]))
        results[example['example_id']] = {
            'squared_error': err,
            'num_samples': t,
            'rmse': float(np.sqrt(err / t)),
            'stft_loss': stft_loss,
        }
        np.save(spill_dir / f"{example['example_id']}.npy",
                estimate.astype('float32'))

    merged = gather_merged(results)
    if is_master():
        out_dir = model_path / 'eval'
        out_dir.mkdir(exist_ok=True)
        total_err = sum(m['squared_error'] for m in merged.values())
        total_t = sum(m['num_samples'] for m in merged.values())
        by_stft = sorted(merged.items(), key=lambda kv: kv[1]['stft_loss'])
        summary = {
            'rmse': float(np.sqrt(total_err / total_t)),
            'stft_loss': float(np.mean(
                [m['stft_loss'] for m in merged.values()])),
            'num_examples': len(merged),
            'num_samples': total_t,
            'sampler': ('ddim_%d' % args.ddim_steps
                        if args.ddim_steps is not None else 'ddpm'),
        }
        (out_dir / 'stft_loss.json').write_text(json.dumps(
            [(k, v['stft_loss']) for k, v in by_stft], indent=2))
        (out_dir / 'means.json').write_text(json.dumps(summary, indent=2))
        audio_dir = out_dir / 'audio'
        audio_dir.mkdir(exist_ok=True)
        n = args.num_audio_dumps
        for example_id, _ in (by_stft[:n] + by_stft[-n:]):
            spilled = spill_dir / f'{example_id}.npy'
            if spilled.exists():
                write_wav(audio_dir / f'{example_id}.wav',
                          np.load(spilled), data.SAMPLE_RATE)
        print(json.dumps(summary, indent=2))
    import shutil
    shutil.rmtree(spill_dir, ignore_errors=True)


if __name__ == '__main__':
    main()
