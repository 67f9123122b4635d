"""Evaluate the supervised speaker classifier: accuracy over an eval split.

Reference parity:
``contrib/examples/speaker_classification/supervised/evaluate.py`` —
batched jitted inference, per-example hit/miss bookkeeping, accuracy on
the master, ``misclassified.json`` with predicted/true labels and
confidences.

Run (synthetic smoke, after train.py --synthetic):
    python -m padertorch_tpu.contrib.examples.speaker_classification.supervised.evaluate \
        --model_path /path/to/storage_dir --synthetic
"""
import argparse
import json
from pathlib import Path

import numpy as np

from padertorch_tpu.evaluation import (
    split_managed, gather_merged, is_master,
)

from . import data
from .model import SpeakerClf


def evaluate_batch(model, batch):
    """Returns {example_id: {hit, true_label, predicted_label, confidence}}."""
    logits = np.asarray(model(batch))
    predictions = logits.argmax(-1)
    exp = np.exp(logits - logits.max(-1, keepdims=True))
    confidences = (exp / exp.sum(-1, keepdims=True)).max(-1)
    labels = np.asarray(batch['speaker_id'])
    return {
        example_id: {
            'hit': bool(label == pred),
            'true_label': int(label),
            'predicted_label': int(pred),
            'confidence': float(conf),
        }
        for example_id, label, pred, conf in zip(
            batch['example_id'], labels, predictions, confidences)
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--model_path', required=True)
    parser.add_argument('--database', default=None)
    parser.add_argument('--synthetic', action='store_true')
    parser.add_argument('--dataset', default='test_clean')
    parser.add_argument('--batch_size', type=int, default=8)
    parser.add_argument('--checkpoint', default='ckpt_best_accuracy.ptt')
    args = parser.parse_args()

    model_path = Path(args.model_path)
    try:
        model = SpeakerClf.from_storage_dir(
            model_path, checkpoint_name=args.checkpoint)
    except FileNotFoundError:
        model = SpeakerClf.from_storage_dir(
            model_path, checkpoint_name='ckpt_latest.ptt')
    model = model.eval()

    if args.synthetic or args.database is None:
        full = data.synthetic_database()
        n = len(full)
        dataset = full[[i for i in range(n) if i % 5 == 0]]
    else:
        from padertorch_tpu.data.database import JsonDatabase
        dataset = JsonDatabase(args.database).get_dataset(args.dataset)

    label_encoder = data.get_label_encoder(model_path, dataset)
    from padertorch_tpu.contrib.je.modules.features import (
        FusedAudioLogMelExtractor,
    )
    if isinstance(model.feature_extractor, FusedAudioLogMelExtractor):
        # trained with --on_device_features: ship raw audio
        dataset = data.prepare_dataset_audio(
            dataset, label_encoder, batch_size=args.batch_size,
            shuffle=False, prefetch=False)
    else:
        dataset = data.prepare_dataset(
            dataset, label_encoder, batch_size=args.batch_size,
            shuffle=False, prefetch=False)

    results = {}
    for batch in split_managed(dataset, progress_bar=True):
        results.update(evaluate_batch(model, batch))

    merged = gather_merged(results)
    if is_master():
        out_dir = model_path / 'eval'
        out_dir.mkdir(exist_ok=True)
        hits = [v['hit'] for v in merged.values()]
        inverse = label_encoder.inverse_label_mapping
        misclassified = {
            k: {**v,
                'true_label': inverse.get(v['true_label'], v['true_label']),
                'predicted_label': inverse.get(
                    v['predicted_label'], v['predicted_label'])}
            for k, v in merged.items() if not v['hit']
        }
        summary = {
            'accuracy': float(np.mean(hits)),
            'num_examples': len(hits),
            'num_misclassified': len(misclassified),
        }
        (out_dir / 'misclassified.json').write_text(
            json.dumps(misclassified, indent=2))
        (out_dir / 'means.json').write_text(json.dumps(summary, indent=2))
        print(json.dumps(summary, indent=2))


if __name__ == '__main__':
    main()
