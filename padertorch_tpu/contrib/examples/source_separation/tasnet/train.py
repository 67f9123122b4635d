"""Train TasNet / DPRNN-TasNet / Conv-TasNet.

Reference parity: ``contrib/examples/source_separation/tasnet/train.py``
— the sacred named configs (``dprnn``, ``convnet``, ``win2``, ``stft``,
``log_mse``) become the ``--variant``/``--loss`` flags.

Run (synthetic smoke):
    python -m padertorch_tpu.contrib.examples.source_separation.tasnet.train \
        --storage_root /tmp/tasnet --synthetic --epochs 2 --variant dprnn
"""
import argparse
from pathlib import Path

import padertorch_tpu as pt
from padertorch_tpu import random as ptrandom
from padertorch_tpu.io import dump_config
from padertorch_tpu.models.tasnet import (
    TasNet, TasEncoder, StftEncoder, IstftDecoder,
)
from padertorch_tpu.modules.convnet import ConvNet
from padertorch_tpu.modules.dual_path_rnn import DPRNN
from padertorch_tpu.modules.dual_path_transformer import DualPathTransformer
from padertorch_tpu.train.trainer import Trainer
from padertorch_tpu.utils.nested import nested_merge

from . import data

VARIANTS = {
    'dprnn': {
        'separator': {
            'factory': DPRNN,
            'input_size': 64, 'rnn_size': 128,
            'window_length': 100, 'hop_size': 50, 'num_blocks': 6,
        },
    },
    'convnet': {
        'separator': {
            'factory': ConvNet,
            'input_size': 256, 'num_blocks': 8, 'num_repeats': 4,
            'hidden_channels': 512,
        },
    },
    'sepformer': {
        'separator': {
            'factory': DualPathTransformer,
            'input_size': 128, 'window_length': 100, 'hop_size': 50,
            'num_blocks': 4, 'num_layers_intra': 2,
            'num_layers_inter': 2, 'num_heads': 8,
        },
    },
    'win2': {
        'encoder': {'factory': TasEncoder, 'window_length': 2},
    },
    'stft': {
        'encoder': {'factory': StftEncoder},
        'decoder': {'factory': IstftDecoder},
        'mask': True,
    },
}


def get_trainer_config(storage_dir, variant='dprnn', loss='si-sdr',
                       updates=None):
    model_updates = nested_merge(
        {'factory': TasNet}, VARIANTS.get(variant, {}))
    loss_weights = {'si-sdr': 0.0, 'log-mse': 0.0, 'log1p-mse': 0.0}
    loss_weights[loss] = 1.0
    return Trainer.get_config(nested_merge({
        'model': model_updates,
        'optimizer': {'factory': pt.Adam, 'gradient_clipping': 5.0},
        'loss_weights': loss_weights,
        'storage_dir': str(storage_dir),
        'summary_trigger': (1000, 'iteration'),
        'checkpoint_trigger': (1, 'epoch'),
        'stop_trigger': (200, 'epoch'),
    }, updates or {}))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--storage_root', default=None)
    parser.add_argument('--database', default=None)
    parser.add_argument('--synthetic', action='store_true')
    parser.add_argument('--variant', default='dprnn',
                        choices=sorted(VARIANTS))
    parser.add_argument('--loss', default='si-sdr',
                        choices=['si-sdr', 'log-mse', 'log1p-mse'])
    parser.add_argument('--epochs', type=int, default=200)
    parser.add_argument('--batch_size', type=int, default=4)
    parser.add_argument(
        '--rnn_backend', default='pallas',
        choices=['scan', 'pallas'],
        help='LSTM time-loop backend; the Pallas fused cell-scan '
             'kernel is ~1.2x faster for DPRNN training on TPU')
    parser.add_argument(
        '--flash', action='store_true',
        help='use the fused Pallas attention backend for the '
             'sepformer variant (ops/pallas/attention.py)')
    parser.add_argument('--segment_length', type=int, default=32000)
    parser.add_argument('--num_examples', type=int, default=None,
                        help='synthetic training-set size '
                             '(default: max(32, 4*batch_size))')
    parser.add_argument('--small', action='store_true',
                        help='tiny model for smoke tests')
    args = parser.parse_args()

    if args.storage_root:
        from padertorch_tpu.io import get_new_subdir
        storage_dir = get_new_subdir(Path(args.storage_root) / 'tasnet')
    else:
        from padertorch_tpu.io import get_new_storage_dir
        storage_dir = get_new_storage_dir('tasnet')

    updates = {'stop_trigger': (args.epochs, 'epoch')}
    if args.small:
        if args.variant == 'sepformer':
            sep_small = {
                'input_size': 16, 'window_length': 10, 'hop_size': 5,
                'num_blocks': 1, 'num_layers_intra': 1,
                'num_layers_inter': 1, 'num_heads': 2,
            }
        else:
            sep_small = {
                'input_size': 16, 'rnn_size': 8,
                'window_length': 10, 'hop_size': 5, 'num_blocks': 2,
            }
        updates['model'] = {
            'encoder': {'feature_size': 32},
            'separator': sep_small,
        }

    ptrandom.seed(0)
    config = get_trainer_config(
        storage_dir, variant=args.variant, loss=args.loss,
        updates=updates)
    dump_config({'trainer': config}, storage_dir / 'config.json')
    from padertorch_tpu.contrib.examples._makefile import \
        write_recipe_makefile
    write_recipe_makefile(
        storage_dir, 'padertorch_tpu.contrib.examples.source_separation.tasnet.train',
        evaluate_module='padertorch_tpu.contrib.examples.source_separation.tasnet.evaluate',
        evaluate_args='--synthetic'
        if (getattr(args, 'synthetic', False)
            or getattr(args, 'database', None) is None)
        else '')
    trainer = Trainer.from_config(config)
    from padertorch_tpu.modules.recurrent import set_rnn_backend
    try:
        set_rnn_backend(trainer.model, args.rnn_backend)
    except AssertionError:
        pass  # convnet variant has no RNNs
    if args.flash:
        from padertorch_tpu.contrib.mk.modules.transformer import \
            set_attention_backend
        set_attention_backend(trainer.model, True)

    if args.synthetic or args.database is None:
        n_train = args.num_examples or max(32, 4 * args.batch_size)
        train_ds = data.synthetic_database(num_examples=n_train)
        dev_ds = data.synthetic_database(
            num_examples=max(8, 2 * args.batch_size), seed=1)
    else:
        from padertorch_tpu.data.database import JsonDatabase
        db = JsonDatabase(args.database)
        train_ds = db.get_dataset('mix_2_spk_min_tr').map(data.read_audio)
        dev_ds = db.get_dataset('mix_2_spk_min_cv').map(data.read_audio)

    seg = min(args.segment_length, 8000 if args.synthetic else 10 ** 9)
    train = data.prepare_dataset(
        train_ds, batch_size=args.batch_size, segment_length=seg)
    dev = data.prepare_dataset(
        dev_ds, batch_size=args.batch_size, segment_length=seg,
        shuffle=False, prefetch=False)
    trainer.test_run(
        data.prepare_dataset(train_ds, batch_size=args.batch_size,
                             segment_length=seg, shuffle=False,
                             prefetch=False),
        dev)
    trainer.register_validation_hook(dev, metric='si-sdr')
    trainer.train(train)
    print(f'Finished. storage_dir={storage_dir}')


if __name__ == '__main__':
    main()
