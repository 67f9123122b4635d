"""Train the supervised speaker classifier.

Reference parity:
``contrib/examples/speaker_classification/supervised/train.py``.

Run (synthetic smoke):
    python -m padertorch_tpu.contrib.examples.speaker_classification.supervised.train \
        --storage_root /tmp/spk --synthetic --epochs 3
"""
import argparse
from pathlib import Path

import padertorch_tpu as pt
from padertorch_tpu import random as ptrandom
from padertorch_tpu.io import dump_config
from padertorch_tpu.train.trainer import Trainer
from padertorch_tpu.utils.nested import nested_merge

from . import data
from .model import SpeakerClf


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--storage_root', default=None)
    parser.add_argument('--database', default=None)
    parser.add_argument('--synthetic', action='store_true')
    parser.add_argument('--epochs', type=int, default=50)
    parser.add_argument('--batch_size', type=int, default=8)
    parser.add_argument('--num_speakers', type=int, default=None)
    parser.add_argument(
        '--on_device_features', action='store_true',
        help='compute the log-mel frontend inside the jitted step '
             '(fused Pallas kernel on TPU) from raw audio, instead of '
             'host STFTs in the data pipeline')
    args = parser.parse_args()

    if args.storage_root:
        from padertorch_tpu.io import get_new_subdir
        storage_dir = get_new_subdir(
            Path(args.storage_root) / 'speaker_clf')
    else:
        from padertorch_tpu.io import get_new_storage_dir
        storage_dir = get_new_storage_dir('speaker_clf')

    if args.synthetic or args.database is None:
        # enough speakers x utterances that the dev split yields the
        # 2+ validation batches test_run needs at any batch size
        full = data.synthetic_database(
            per_speaker=max(12, (10 * args.batch_size) // 8))
        n = len(full)
        # stratified-ish split: every 5th example to dev
        train_ds = full[[i for i in range(n) if i % 5 != 0]]
        dev_ds = full[[i for i in range(n) if i % 5 == 0]]
    else:
        from padertorch_tpu.data.database import JsonDatabase
        db = JsonDatabase(args.database)
        train_ds = db.get_dataset('train_clean_100')
        dev_ds = db.get_dataset('dev_clean')

    label_encoder = data.get_label_encoder(storage_dir, train_ds)
    num_speakers = args.num_speakers or len(label_encoder.label_mapping)

    ptrandom.seed(0)
    model_updates = {
        'factory': SpeakerClf,
        'num_speakers': num_speakers,
        'cnn_channels': (16, 32),
        'hidden_size': 64,
    }
    if args.on_device_features:
        from padertorch_tpu.contrib.je.modules.features import (
            FusedAudioLogMelExtractor)
        model_updates['feature_extractor'] = {
            'factory': FusedAudioLogMelExtractor,
            'sample_rate': data.SAMPLE_RATE,
            'stft_size': 512,
            'shift': 128,
            'number_of_filters': 64,
        }
    config = Trainer.get_config({
        'model': model_updates,
        'optimizer': {'factory': pt.Adam, 'gradient_clipping': 10.0,
                      'lr': 3e-4},
        'storage_dir': str(storage_dir),
        'stop_trigger': (args.epochs, 'epoch'),
        'summary_trigger': (1, 'epoch'),
        'checkpoint_trigger': (1, 'epoch'),
    })
    dump_config({'trainer': config}, storage_dir / 'config.json')
    from padertorch_tpu.contrib.examples._makefile import \
        write_recipe_makefile
    write_recipe_makefile(
        storage_dir, 'padertorch_tpu.contrib.examples.speaker_classification.supervised.train',
        evaluate_module='padertorch_tpu.contrib.examples.speaker_classification.supervised.evaluate',
        evaluate_args='--synthetic'
        if (getattr(args, 'synthetic', False)
            or getattr(args, 'database', None) is None)
        else '')
    trainer = Trainer.from_config(config)

    prepare = (data.prepare_dataset_audio if args.on_device_features
               else data.prepare_dataset)
    train = prepare(train_ds, label_encoder, batch_size=args.batch_size)
    dev = prepare(dev_ds, label_encoder, batch_size=args.batch_size,
                  shuffle=False, prefetch=False)
    trainer.test_run(
        prepare(train_ds, label_encoder, batch_size=args.batch_size,
                shuffle=False, prefetch=False),
        dev)
    trainer.register_validation_hook(dev, metric='accuracy', maximize=True)
    trainer.train(train)
    print(f'Finished. storage_dir={storage_dir}')


if __name__ == '__main__':
    main()
