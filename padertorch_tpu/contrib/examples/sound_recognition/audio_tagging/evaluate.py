"""Evaluate the audio tagger: mAP / mAUC / lwlrap / mF1 on an eval split.

Reference parity:
``contrib/examples/sound_recognition/audio_tagging/evaluate.py:177`` —
batched inference collecting per-clip scores + multi-hot targets, then
metrics over the full score matrix via ``evaluation/multilabel.py``.

Run (synthetic smoke, after train.py --synthetic):
    python -m padertorch_tpu.contrib.examples.sound_recognition.audio_tagging.evaluate \
        --model_path /path/to/storage_dir --synthetic
"""
import argparse
import json
from pathlib import Path

import numpy as np

from padertorch_tpu.evaluation import (
    split_managed, gather_merged, is_master,
)
from padertorch_tpu.evaluation.multilabel import (
    mean_average_precision, mean_auc, lwlrap, fscore,
)

from .train import WALNet, synthetic_database, prepare


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--model_path', required=True)
    parser.add_argument('--synthetic', action='store_true')
    parser.add_argument('--batch_size', type=int, default=8)
    parser.add_argument('--checkpoint', default='ckpt_best_mAP.ptt')
    args = parser.parse_args()

    model_path = Path(args.model_path)
    try:
        model = WALNet.from_storage_dir(
            model_path, checkpoint_name=args.checkpoint)
    except FileNotFoundError:
        model = WALNet.from_storage_dir(
            model_path, checkpoint_name='ckpt_latest.ptt')
    model = model.eval()

    # eval split: a synthetic set with a held-out seed (the reference
    # evaluates AudioSet 'eval'; there is no audio data in this env)
    dataset = prepare(
        synthetic_database(num_examples=32, seed=7),
        batch_size=args.batch_size, shuffle=False)

    results = {}
    for batch in split_managed(dataset, progress_bar=True):
        logits = np.asarray(model(batch))
        scores = 1.0 / (1.0 + np.exp(-logits))
        for example_id, score, target in zip(
                batch['example_id'], scores, np.asarray(batch['events'])):
            results[example_id] = {
                'scores': score.tolist(),
                'targets': target.tolist(),
            }

    merged = gather_merged(results)
    if is_master():
        out_dir = model_path / 'eval'
        out_dir.mkdir(exist_ok=True)
        scores = np.asarray([v['scores'] for v in merged.values()])
        targets = np.asarray([v['targets'] for v in merged.values()])
        summary = {
            'mAP': float(mean_average_precision(scores, targets)),
            'mAUC': float(mean_auc(scores, targets)),
            'lwlrap': float(lwlrap(scores, targets)),
            'mF1': float(fscore(scores, targets)),
            'num_examples': len(merged),
        }
        (out_dir / 'scores.json').write_text(json.dumps(merged))
        (out_dir / 'means.json').write_text(json.dumps(summary, indent=2))
        print(json.dumps(summary, indent=2))


if __name__ == '__main__':
    main()
