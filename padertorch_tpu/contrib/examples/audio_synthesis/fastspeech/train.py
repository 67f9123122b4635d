"""Train the FastSpeech-style text-to-mel model.

Beyond-reference recipe (the reference has no acoustic TTS model); see
``model.py`` for the TPU-first design notes.

Run (synthetic smoke):
    python -m padertorch_tpu.contrib.examples.audio_synthesis.\
fastspeech.train --storage_root /tmp/fs --synthetic --epochs 5
"""
import argparse
from pathlib import Path

import padertorch_tpu as pt
from padertorch_tpu import random as ptrandom
from padertorch_tpu.io import dump_config
from padertorch_tpu.train.trainer import Trainer
from padertorch_tpu.utils.nested import nested_merge

from . import data
from .model import FastSpeech


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--storage_root', default=None)
    parser.add_argument('--database', default=None)
    parser.add_argument('--synthetic', action='store_true')
    parser.add_argument('--epochs', type=int, default=40)
    parser.add_argument('--batch_size', type=int, default=8)
    parser.add_argument('--num_examples', type=int, default=64)
    parser.add_argument('--d_model', type=int, default=128)
    parser.add_argument('--num_layers', type=int, default=2)
    args = parser.parse_args()

    if args.storage_root:
        from padertorch_tpu.io import get_new_subdir
        storage_dir = get_new_subdir(Path(args.storage_root) / 'fastspeech')
    else:
        from padertorch_tpu.io import get_new_storage_dir
        storage_dir = get_new_storage_dir('fastspeech')

    ptrandom.seed(0)
    config = Trainer.get_config(nested_merge({
        'model': {
            'factory': FastSpeech,
            'vocab_size': data.VOCAB_SIZE,
            'n_mels': data.N_MELS,
            'd_model': args.d_model,
            'encoder': {'num_layers': args.num_layers},
            'decoder': {'num_layers': args.num_layers},
        },
        'optimizer': {'factory': pt.Adam, 'lr': 1e-3,
                      'gradient_clipping': 10.0},
        'storage_dir': str(storage_dir),
        'summary_trigger': (1, 'epoch'),
        'checkpoint_trigger': (1, 'epoch'),
        'stop_trigger': (args.epochs, 'epoch'),
    }, {}))
    dump_config({'trainer': config}, storage_dir / 'config.json')
    from padertorch_tpu.contrib.examples._makefile import \
        write_recipe_makefile
    write_recipe_makefile(
        storage_dir,
        'padertorch_tpu.contrib.examples.audio_synthesis.fastspeech.train',
        evaluate_module=(
            'padertorch_tpu.contrib.examples.audio_synthesis.'
            'fastspeech.evaluate'),
        evaluate_args='--synthetic'
        if (args.synthetic or args.database is None) else '')
    trainer = Trainer.from_config(config)

    # real databases would need an aligner for teacher durations; the
    # synthetic task has them by construction
    train_ds = data.synthetic_database(num_examples=args.num_examples)
    dev_ds = data.synthetic_database(
        num_examples=2 * args.batch_size, seed=1)

    train = data.prepare_dataset(train_ds, batch_size=args.batch_size)
    dev = data.prepare_dataset(
        dev_ds, batch_size=args.batch_size, shuffle=False, prefetch=False)
    trainer.test_run(
        data.prepare_dataset(train_ds, batch_size=args.batch_size,
                             shuffle=False, prefetch=False),
        dev)
    trainer.register_validation_hook(dev)
    trainer.train(train)
    print(f'Finished. storage_dir={storage_dir}')


if __name__ == '__main__':
    main()
