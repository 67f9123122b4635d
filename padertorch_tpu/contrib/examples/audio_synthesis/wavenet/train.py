"""Train the WaveNet vocoder.

Reference parity: ``contrib/examples/audio_synthesis/wavenet/train.py``.

Run (synthetic smoke):
    python -m padertorch_tpu.contrib.examples.audio_synthesis.wavenet.train \
        --storage_root /tmp/wavenet --synthetic --epochs 2 --small
"""
import argparse
from pathlib import Path

import padertorch_tpu as pt
from padertorch_tpu import random as ptrandom
from padertorch_tpu.io import dump_config
from padertorch_tpu.train.trainer import Trainer
from padertorch_tpu.utils.nested import nested_merge

from . import data
from .model import WaveNetVocoder


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--storage_root', default=None)
    parser.add_argument('--database', default=None)
    parser.add_argument('--synthetic', action='store_true')
    parser.add_argument('--epochs', type=int, default=20)
    parser.add_argument('--batch_size', type=int, default=2)
    parser.add_argument('--num_examples', type=int, default=None,
                        help='size of the synthetic training set')
    parser.add_argument('--small', action='store_true')
    args = parser.parse_args()

    if args.storage_root:
        from padertorch_tpu.io import get_new_subdir
        storage_dir = get_new_subdir(Path(args.storage_root) / 'wavenet')
    else:
        from padertorch_tpu.io import get_new_storage_dir
        storage_dir = get_new_storage_dir('wavenet')

    updates = {'stop_trigger': (args.epochs, 'epoch')}
    segment_length = 16000
    if args.small:
        updates['model'] = {'wavenet': {
            'n_layers': 2, 'max_dilation': 2,
            'n_residual_channels': 8, 'n_skip_channels': 16,
        }}
        segment_length = 4000

    ptrandom.seed(0)
    config = Trainer.get_config(nested_merge({
        'model': {'factory': WaveNetVocoder},
        'optimizer': {'factory': pt.Adam, 'gradient_clipping': 10.0,
                      'lr': 1e-3},
        'storage_dir': str(storage_dir),
        'summary_trigger': (1, 'epoch'),
        'checkpoint_trigger': (1, 'epoch'),
    }, updates))
    dump_config({'trainer': config}, storage_dir / 'config.json')
    from padertorch_tpu.contrib.examples._makefile import \
        write_recipe_makefile
    write_recipe_makefile(
        storage_dir, 'padertorch_tpu.contrib.examples.audio_synthesis.wavenet.train',
        evaluate_module='padertorch_tpu.contrib.examples.audio_synthesis.wavenet.evaluate',
        evaluate_args='--synthetic'
        if (getattr(args, 'synthetic', False)
            or getattr(args, 'database', None) is None)
        else '')
    trainer = Trainer.from_config(config)

    if args.synthetic or args.database is None:
        train_ds = data.synthetic_database(
            num_examples=args.num_examples
            or max(12, 4 * args.batch_size))
        # at least 2 validation batches (test_run exercises two)
        dev_ds = data.synthetic_database(
            num_examples=2 * args.batch_size, seed=1)
    else:
        from padertorch_tpu.data.database import JsonDatabase
        db = JsonDatabase(args.database)
        from padertorch_tpu.contrib.je.data.transforms import AudioReader
        reader = AudioReader(target_sample_rate=data.SAMPLE_RATE)
        train_ds = db.get_dataset('train_clean_100').map(reader)
        dev_ds = db.get_dataset('dev_clean').map(reader)

    train = data.prepare_dataset(
        train_ds, batch_size=args.batch_size,
        segment_length=segment_length)
    dev = data.prepare_dataset(
        dev_ds, batch_size=args.batch_size,
        segment_length=segment_length, shuffle=False, prefetch=False)
    trainer.test_run(
        data.prepare_dataset(train_ds, batch_size=args.batch_size,
                             segment_length=segment_length,
                             shuffle=False, prefetch=False),
        dev)
    trainer.register_validation_hook(dev)
    trainer.train(train)
    print(f'Finished. storage_dir={storage_dir}')


if __name__ == '__main__':
    main()
