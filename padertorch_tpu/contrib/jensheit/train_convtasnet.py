"""Train (Conv-)TasNet from the jensheit provider surface.

Reference parity: ``padertorch/contrib/jensheit/train_convtasnet.py``
— the sacred experiment whose config surface (batch_size=4,
chunk_size=32000, train/validate dataset names, loss_weights over
si-sdr/log-mse/log1p-mse, lr-scheduler step/gamma) and named configs
(``win2`` :93, ``stft`` :119, ``dprnn`` :136, ``convnet`` :148,
``log_mse`` :158, ``log1p_mse`` :171, ``on_wsj0_2mix_max`` :183)
become ``--variant``/``--loss``/``--max`` flags; its provider chain
(``pre_batch_transform`` :190 → ``RandomChunkSingle`` →
shuffle → batch → ``Sorter('num_samples')`` → collate,
``prepare_iterable`` :205) is reproduced on the repo's lazy pipeline.

The model itself is the repo's TasNet family
(``padertorch_tpu.models.tasnet``) — one fused jitted train step on
TPU.  Run a synthetic smoke with::

    python -m padertorch_tpu.contrib.jensheit.train_convtasnet \
        --storage_root /tmp/ctn --synthetic --epochs 1 --small
"""
import argparse
from pathlib import Path

import numpy as np

import padertorch_tpu as pt
from padertorch_tpu import random as ptrandom
from padertorch_tpu.data import dataset as lazy
from padertorch_tpu.data.batch import Sorter
from padertorch_tpu.data.utils import collate_fn, pad_batch
from padertorch_tpu.contrib.neumann.chunking import RandomChunkSingle
from padertorch_tpu.io import dump_config
from padertorch_tpu.models.tasnet import (
    TasNet, TasEncoder, StftEncoder, IstftDecoder,
)
from padertorch_tpu.modules.convnet import ConvNet
from padertorch_tpu.modules.dual_path_rnn import DPRNN
from padertorch_tpu.train.trainer import Trainer
from padertorch_tpu.utils.nested import nested_merge

__all__ = ['pre_batch_transform', 'prepare_iterable',
           'get_trainer_config', 'VARIANTS']

experiment_name = 'convtasnet'

# named configs of the reference experiment
VARIANTS = {
    'baseline': {},
    'win2': {
        'encoder': {'factory': TasEncoder, 'window_length': 2},
        'separator': {'window_length': 250, 'hop_size': 125},
    },
    'stft': {
        'encoder': {'factory': StftEncoder},
        'decoder': {'factory': IstftDecoder},
        'mask': True,
    },
    'dprnn': {
        'separator': {
            'factory': DPRNN,
            'input_size': 64, 'rnn_size': 128,
            'window_length': 100, 'hop_size': 50, 'num_blocks': 6,
        },
    },
    'convnet': {
        'encoder': {'factory': TasEncoder, 'feature_size': 256},
        'separator': {
            'factory': ConvNet,
            'input_size': 256, 'num_blocks': 8, 'num_repeats': 4,
            'hidden_channels': 512,
        },
    },
}


def pre_batch_transform(inputs):
    """Raw database example → training keys (ref :190): ``y`` mixture,
    ``s`` stacked sources, passthrough ids/paths."""
    audio = inputs.get('audio_data', {})
    if 's' in audio or 'speech_source' in audio:
        s = np.ascontiguousarray(
            audio.get('s', audio.get('speech_source')), np.float32)
        y = np.ascontiguousarray(
            audio.get('y', audio.get('observation')), np.float32)
    else:  # load from disk
        import soundfile
        s = np.ascontiguousarray([
            soundfile.read(p)[0]
            for p in inputs['audio_path']['speech_source']
        ], np.float32)
        y = np.ascontiguousarray(
            soundfile.read(inputs['audio_path']['observation'])[0],
            np.float32)
    return {
        's': s, 'y': y,
        'num_samples': inputs.get('num_samples', y.shape[-1]),
        'example_id': inputs['example_id'],
        'audio_path': inputs.get('audio_path', {}),
    }


def _collate(batch):
    batch = collate_fn(batch)
    y, num_samples = pad_batch(batch['y'], axis=-1)
    s, _ = pad_batch(batch['s'], axis=-1)
    return {
        'example_id': list(batch['example_id']),
        'y': y.astype('float32'),
        's': s.astype('float32'),
        'num_samples': np.asarray(num_samples, 'int32'),
    }


def prepare_iterable(db, dataset_name, batch_size, chunk_size,
                     prefetch=True, iterator_slice=None):
    """Provider chain of the reference (ref :205): map → random chunk
    → shuffle → batch → sort by length → collate (→ prefetch).

    ``db`` may be a JsonDatabase-like object (``get_dataset``) or a
    Dataset directly.
    """
    iterator = (db.get_dataset(dataset_name)
                if hasattr(db, 'get_dataset') else db)
    if iterator_slice is not None:
        iterator = lazy.from_list(list(iterator)[iterator_slice])

    chunker = RandomChunkSingle(
        chunk_size, chunk_keys=('y', 's'), axis=-1)
    iterator = (
        iterator
        .map(pre_batch_transform)
        .map(chunker)
        .shuffle(reshuffle=True)
        .batch(batch_size)
        .map(Sorter('num_samples'))
        .map(_collate)
    )
    catch_exception = (chunker.chunk_size != -1
                       and getattr(chunker, 'min_length', 1) > 0)
    if prefetch:
        iterator = iterator.prefetch(
            8, 16, catch_filter_exception=catch_exception)
    elif catch_exception:
        iterator = iterator.catch()
    return iterator


def get_trainer_config(storage_dir, variant='baseline', loss='si-sdr',
                       updates=None):
    loss_weights = {'si-sdr': 0.0, 'log-mse': 0.0, 'log1p-mse': 0.0}
    loss_weights[loss] = 1.0
    return Trainer.get_config(nested_merge({
        'model': nested_merge(
            {'factory': TasNet}, VARIANTS.get(variant, {})),
        'optimizer': {'factory': pt.Adam, 'gradient_clipping': 1.0},
        'loss_weights': loss_weights,
        'storage_dir': str(storage_dir),
        'summary_trigger': (1000, 'iteration'),
        'checkpoint_trigger': (1, 'epoch'),
        'stop_trigger': (100, 'epoch'),
    }, updates or {}))


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('--storage_root', default=None)
    parser.add_argument('--database_json', default=None)
    parser.add_argument('--synthetic', action='store_true')
    parser.add_argument('--variant', default='baseline',
                        choices=sorted(VARIANTS))
    parser.add_argument('--loss', default='si-sdr',
                        choices=['si-sdr', 'log-mse', 'log1p-mse'])
    parser.add_argument('--train_dataset', default='mix_2_spk_min_tr')
    parser.add_argument('--validate_dataset',
                        default='mix_2_spk_min_cv')
    parser.add_argument('--max', action='store_true',
                        help='on_wsj0_2mix_max: max datasets, no chunk')
    parser.add_argument('--epochs', type=int, default=100)
    parser.add_argument('--batch_size', type=int, default=4)
    parser.add_argument('--chunk_size', type=int, default=32000)
    parser.add_argument('--small', action='store_true',
                        help='tiny model for smoke tests')
    parser.add_argument('--debug', action='store_true')
    args = parser.parse_args()

    if args.max:
        args.chunk_size = -1
        args.train_dataset = 'mix_2_spk_max_tr'
        args.validate_dataset = 'mix_2_spk_max_cv'

    if args.storage_root:
        from padertorch_tpu.io import get_new_subdir
        storage_dir = get_new_subdir(
            Path(args.storage_root) / experiment_name)
    else:
        from padertorch_tpu.io import get_new_storage_dir
        storage_dir = get_new_storage_dir(experiment_name)

    updates = {'stop_trigger': (args.epochs, 'epoch')}
    if args.small:
        updates['model'] = {
            'encoder': {'feature_size': 32},
            'separator': {
                'input_size': 16, 'rnn_size': 8,
                'window_length': 10, 'hop_size': 5, 'num_blocks': 2,
            } if args.variant in ('baseline', 'dprnn') else {
                'input_size': 32, 'num_blocks': 2, 'num_repeats': 1,
                'hidden_channels': 16,
            },
        }
        if args.variant == 'convnet':
            updates['model']['encoder'] = {'feature_size': 32}

    ptrandom.seed(0)
    config = get_trainer_config(
        storage_dir, variant=args.variant, loss=args.loss,
        updates=updates)
    dump_config({'trainer': config}, storage_dir / 'config.json')
    from padertorch_tpu.contrib.examples._makefile import \
        write_recipe_makefile
    write_recipe_makefile(
        storage_dir, 'padertorch_tpu.contrib.jensheit.train_convtasnet')
    trainer = Trainer.from_config(config)

    if args.synthetic or args.database_json is None:
        from padertorch_tpu.contrib.examples.source_separation.tasnet \
            import data as tasnet_data
        chunk = min(args.chunk_size, 8000) \
            if args.chunk_size > 0 else 8000

        def to_jensheit(ex):
            return {
                'example_id': ex['example_id'],
                'audio_data': {'y': ex['observation'],
                               's': ex['speech_source']},
                'num_samples': ex['num_samples'],
            }

        train_src = tasnet_data.synthetic_database(
            num_examples=max(16, 4 * args.batch_size)).map(to_jensheit)
        dev_src = tasnet_data.synthetic_database(
            num_examples=max(8, 2 * args.batch_size),
            seed=1).map(to_jensheit)
    else:
        from padertorch_tpu.data.database import JsonDatabase
        db = JsonDatabase(args.database_json)
        train_src = db.get_dataset(args.train_dataset)
        dev_src = db.get_dataset(args.validate_dataset)
        chunk = args.chunk_size

    train = prepare_iterable(
        train_src, None, args.batch_size, chunk,
        prefetch=not args.debug)
    dev = prepare_iterable(
        dev_src, None, args.batch_size, chunk, prefetch=False)
    trainer.test_run(
        prepare_iterable(train_src, None, args.batch_size, chunk,
                         prefetch=False),
        dev)
    trainer.register_validation_hook(dev, metric='si-sdr')
    trainer.train(train)
    print(f'Finished. storage_dir={storage_dir}')


if __name__ == '__main__':
    main()
