"""Evaluate the FastSpeech model.

Two regimes per utterance:

- **teacher-forced**: ground-truth durations drive the length
  regulator -> frame-aligned mel L1/RMSE.
- **free-running** (:meth:`FastSpeech.synthesize`): predicted
  durations -> duration MAE (frames) and total-length relative error.

Run (synthetic smoke, after train.py --synthetic):
    python -m padertorch_tpu.contrib.examples.audio_synthesis.\
fastspeech.evaluate --model_path /path/to/storage_dir --synthetic
"""
import argparse
import json
from pathlib import Path

import numpy as np

from padertorch_tpu.evaluation import (
    split_managed, gather_merged, is_master,
)

from . import data
from .model import FastSpeech


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--model_path', required=True)
    parser.add_argument('--synthetic', action='store_true')
    parser.add_argument('--num_examples', type=int, default=16)
    parser.add_argument('--checkpoint', default='ckpt_best_loss.ptt')
    args = parser.parse_args()

    model_path = Path(args.model_path)
    model = FastSpeech.from_storage_dir(
        model_path, checkpoint_name=args.checkpoint).eval()

    import jax.numpy as jnp

    dataset = data.synthetic_database(
        num_examples=args.num_examples, seed=2)

    results = {}
    for example in split_managed(dataset, progress_bar=True):
        tokens = jnp.asarray(example['tokens'][None])
        durations = example['durations']
        mel_target = example['mel']
        t = mel_target.shape[0]
        # teacher-forced mel
        out = model({
            'tokens': tokens,
            'token_lengths': np.array([tokens.shape[1]], 'int32'),
            'durations': jnp.asarray(durations[None]),
            'mel': jnp.asarray(mel_target[None]),
        })
        mel_pred = np.asarray(out['mel'])[0, :t]
        mel_l1 = float(np.abs(mel_pred - mel_target).mean())
        mel_rmse = float(np.sqrt(((mel_pred - mel_target) ** 2).mean()))
        # free-running durations
        _, num_frames, dur_pred = model.synthesize(
            tokens, max_frames=4 * t)
        dur_pred = np.asarray(dur_pred)[0, :len(durations)]
        dur_mae = float(np.abs(dur_pred - durations).mean())
        len_rel_err = float(
            abs(int(num_frames[0]) - t) / max(t, 1))
        results[example['example_id']] = {
            'mel_l1': mel_l1,
            'mel_rmse': mel_rmse,
            'duration_mae': dur_mae,
            'length_relative_error': len_rel_err,
            'num_frames': t,
        }

    merged = gather_merged(results)
    if is_master():
        out_dir = model_path / 'eval'
        out_dir.mkdir(exist_ok=True)
        summary = {
            key: float(np.mean([m[key] for m in merged.values()]))
            for key in ('mel_l1', 'mel_rmse', 'duration_mae',
                        'length_relative_error')
        }
        summary['num_examples'] = len(merged)
        (out_dir / 'per_example.json').write_text(
            json.dumps(merged, indent=2, sort_keys=True))
        (out_dir / 'means.json').write_text(json.dumps(summary, indent=2))
        print(json.dumps(summary, indent=2))


if __name__ == '__main__':
    main()
