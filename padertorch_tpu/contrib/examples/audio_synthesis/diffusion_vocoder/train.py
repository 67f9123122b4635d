"""Train the diffusion (DDPM) vocoder.

Beyond-reference recipe: a score-based vocoder trained in-framework on
the diffusion primitives (``ops/diffusion.py``) — the reference only
ships inference wrappers for externally trained vocoders.

Run (synthetic smoke):
    python -m padertorch_tpu.contrib.examples.audio_synthesis.\
diffusion_vocoder.train --storage_root /tmp/dv --synthetic --epochs 2 --small
"""
import argparse
from pathlib import Path

import padertorch_tpu as pt
from padertorch_tpu import random as ptrandom
from padertorch_tpu.io import dump_config
from padertorch_tpu.train.trainer import Trainer
from padertorch_tpu.utils.nested import nested_merge

from . import data
from .model import DiffusionVocoder


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--storage_root', default=None)
    parser.add_argument('--database', default=None)
    parser.add_argument('--synthetic', action='store_true')
    parser.add_argument('--epochs', type=int, default=50)
    parser.add_argument('--batch_size', type=int, default=4)
    parser.add_argument('--num_examples', type=int, default=None)
    parser.add_argument('--num_steps', type=int, default=50,
                        help='diffusion steps T')
    parser.add_argument('--schedule', default='linear',
                        choices=('linear', 'cosine'))
    parser.add_argument('--small', action='store_true',
                        help='tiny network + short segments (CPU smoke)')
    args = parser.parse_args()

    if args.storage_root:
        from padertorch_tpu.io import get_new_subdir
        storage_dir = get_new_subdir(
            Path(args.storage_root) / 'diffusion_vocoder')
    else:
        from padertorch_tpu.io import get_new_storage_dir
        storage_dir = get_new_storage_dir('diffusion_vocoder')

    updates = {'stop_trigger': (args.epochs, 'epoch')}
    segment_length = 16000
    if args.small:
        updates['model'] = {
            'denoiser': {'channels': 16, 'num_layers': 4, 'cycle': 4},
        }
        segment_length = 4000

    ptrandom.seed(0)
    config = Trainer.get_config(nested_merge({
        'model': {
            'factory': DiffusionVocoder,
            'num_steps': args.num_steps,
            'schedule_kind': args.schedule,
        },
        'optimizer': {'factory': pt.Adam, 'lr': 2e-4,
                      'gradient_clipping': 10.0},
        'storage_dir': str(storage_dir),
        'summary_trigger': (1, 'epoch'),
        'checkpoint_trigger': (1, 'epoch'),
    }, updates))
    dump_config({'trainer': config}, storage_dir / 'config.json')
    from padertorch_tpu.contrib.examples._makefile import \
        write_recipe_makefile
    write_recipe_makefile(
        storage_dir,
        'padertorch_tpu.contrib.examples.audio_synthesis.'
        'diffusion_vocoder.train',
        evaluate_module=(
            'padertorch_tpu.contrib.examples.audio_synthesis.'
            'diffusion_vocoder.evaluate'),
        evaluate_args='--synthetic'
        if (args.synthetic or args.database is None) else '')
    trainer = Trainer.from_config(config)

    if args.synthetic or args.database is None:
        train_ds = data.synthetic_database(
            num_examples=args.num_examples
            or max(12, 4 * args.batch_size))
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
