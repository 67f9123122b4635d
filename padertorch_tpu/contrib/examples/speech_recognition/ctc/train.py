"""Train the Conformer-CTC speech recognizer.

Beyond-reference recipe (padertorch ships no ASR example); the recipe
shape (argparse entry point, synthetic smoke data, Trainer config dump,
per-experiment Makefile, test_run before training) mirrors the other
recipes, e.g. ``speaker_classification/supervised/train.py``.

Run (synthetic smoke):
    python -m padertorch_tpu.contrib.examples.speech_recognition.ctc.train \
        --storage_root /tmp/asr --synthetic --epochs 5
"""
import argparse
from pathlib import Path

import padertorch_tpu as pt
from padertorch_tpu import random as ptrandom
from padertorch_tpu.io import dump_config
from padertorch_tpu.train.trainer import Trainer

from . import data
from .model import AttentionASR, ConformerCTC, TransducerASR


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--storage_root', default=None)
    parser.add_argument('--database', default=None)
    parser.add_argument('--synthetic', action='store_true')
    parser.add_argument('--epochs', type=int, default=50)
    parser.add_argument('--batch_size', type=int, default=8)
    parser.add_argument('--num_examples', type=int, default=96)
    parser.add_argument('--vocab_size', type=int, default=data.VOCAB_SIZE)
    parser.add_argument('--d_model', type=int, default=96)
    parser.add_argument('--num_layers', type=int, default=2)
    parser.add_argument('--num_heads', type=int, default=4)
    parser.add_argument('--kernel_size', type=int, default=15)
    parser.add_argument(
        '--model', choices=('ctc', 'transducer', 'aed'), default='ctc',
        help='ctc: linear head + CTC loss; transducer: LSTM prediction '
             'network + additive joint + RNN-T loss; aed: attention '
             'encoder-decoder (teacher-forced label-smoothed CE, '
             'KV-cache beam decoding)')
    parser.add_argument(
        '--causal', action='store_true',
        help='streaming variant: causal attention + left-padded '
             'depthwise convs (exact prefix property)')
    parser.add_argument(
        '--markov', type=float, default=0.0,
        help='synthetic transcripts follow a +1 bigram chain with '
             'this probability (enables the LM fusion demo)')
    args = parser.parse_args()

    if args.storage_root:
        from padertorch_tpu.io import get_new_subdir
        storage_dir = get_new_subdir(Path(args.storage_root) / 'ctc_asr')
    else:
        from padertorch_tpu.io import get_new_storage_dir
        storage_dir = get_new_storage_dir('ctc_asr')

    if args.synthetic or args.database is None:
        full = data.synthetic_database(
            num_examples=max(args.num_examples, 6 * args.batch_size),
            vocab_size=args.vocab_size, markov=args.markov)
        n = len(full)
        train_ds = full[[i for i in range(n) if i % 5 != 0]]
        dev_ds = full[[i for i in range(n) if i % 5 == 0]]
    else:
        from padertorch_tpu.data.database import JsonDatabase
        db = JsonDatabase(args.database)
        train_ds = db.get_dataset('train')
        dev_ds = db.get_dataset('dev')

    ptrandom.seed(0)
    config = Trainer.get_config({
        'model': {
            'factory': {'ctc': ConformerCTC,
                        'transducer': TransducerASR,
                        'aed': AttentionASR}[args.model],
            'vocab_size': args.vocab_size,
            'd_model': args.d_model,
            'num_layers': args.num_layers,
            'num_heads': args.num_heads,
            'kernel_size': args.kernel_size,
            'causal': args.causal,
        },
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
        storage_dir,
        'padertorch_tpu.contrib.examples.speech_recognition.ctc.train',
        evaluate_module=(
            'padertorch_tpu.contrib.examples.speech_recognition.ctc'
            '.evaluate'),
        evaluate_args='--synthetic'
        if (args.synthetic or args.database is None) else '')
    trainer = Trainer.from_config(config)

    train = data.prepare_dataset(train_ds, batch_size=args.batch_size)
    dev = data.prepare_dataset(dev_ds, batch_size=args.batch_size,
                               shuffle=False, prefetch=False)
    trainer.test_run(
        data.prepare_dataset(train_ds, batch_size=args.batch_size,
                             shuffle=False, prefetch=False),
        dev)
    trainer.register_validation_hook(dev, metric='loss')
    trainer.train(train)
    print(f'Finished. storage_dir={storage_dir}')


if __name__ == '__main__':
    main()
