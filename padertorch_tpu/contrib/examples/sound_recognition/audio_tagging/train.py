"""Audio tagging (WALNet-style CNN on log-mel, multi-hot targets).

Reference parity:
``contrib/examples/sound_recognition/audio_tagging/train.py``.

Run (synthetic smoke):
    python -m padertorch_tpu.contrib.examples.sound_recognition.audio_tagging.train \
        --storage_root /tmp/tagging --synthetic --epochs 2
"""
import argparse
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

import padertorch_tpu as pt
from padertorch_tpu import nn
from padertorch_tpu import random as ptrandom
from padertorch_tpu.base import Model
from padertorch_tpu.data import dataset as lazy
from padertorch_tpu.data.utils import collate_fn, pad_batch
from padertorch_tpu.contrib.je.modules.features import (
    NormalizedLogMelExtractor,
)
from padertorch_tpu.contrib.je.modules.conv import CNN2d
from padertorch_tpu.contrib.je.modules.reduce import Mean
from padertorch_tpu.io import dump_config
from padertorch_tpu.train.trainer import Trainer

from padertorch_tpu.contrib.examples.speaker_classification.supervised \
    import data as spk_data

NUM_EVENTS = 10


class WALNet(Model):
    """CNN over log-mel + sigmoid multi-label head."""

    @classmethod
    def finalize_dogmatic_config(cls, config):
        config['feature_extractor'] = {
            'factory': NormalizedLogMelExtractor,
            'sample_rate': 16000,
            'stft_size': 512,
            'number_of_filters': 64,
        }
        config['cnn'] = {
            'factory': CNN2d,
            'in_channels': 1,
            'out_channels': [16, 32, 32],
            'kernel_size': 3,
            'pool_size': [2, 2, 1],
            'norm': 'batch',
        }

    def __init__(self, feature_extractor, cnn, num_events=NUM_EVENTS):
        self.feature_extractor = feature_extractor
        self.cnn = cnn
        self.pool = Mean(axis=-1)
        self.head = nn.Linear(
            cnn.out_channels * (64 // 4), num_events)

    def forward(self, inputs):
        x, seq_len = self.feature_extractor(
            inputs['stft'], seq_len=inputs.get('seq_len'))
        h, seq_len = self.cnn(x, seq_len)
        b, c, m, t = h.shape
        h = h.reshape(b, c * m, t)
        h = self.pool(h, seq_len)
        return self.head(h)

    def review(self, inputs, outputs):
        targets = inputs['events']
        bce = jnp.mean(
            jnp.maximum(outputs, 0) - outputs * targets
            + jnp.log1p(jnp.exp(-jnp.abs(outputs))))
        return {
            'loss': bce,
            'buffers': {
                'scores': jax.nn.sigmoid(outputs),
                'targets': targets,
            },
        }

    def modify_summary(self, summary):
        from padertorch_tpu.evaluation.multilabel import (
            mean_average_precision, mean_auc, lwlrap, fscore,
        )
        buffers = summary['buffers']
        if 'scores' in buffers:
            scores = np.concatenate(
                [np.asarray(s) for s in buffers.pop('scores')])
            targets = np.concatenate(
                [np.asarray(t) for t in buffers.pop('targets')])
            summary['scalars']['mAP'] = mean_average_precision(
                scores, targets)
            summary['scalars']['mAUC'] = mean_auc(scores, targets)
            summary['scalars']['lwlrap'] = lwlrap(scores, targets)
            summary['scalars']['mF1'] = fscore(scores, targets)
        return super().modify_summary(summary)


def synthetic_database(num_examples=64, num_samples=16000, seed=0):
    """Each event class adds a characteristic tone burst."""
    rng = np.random.RandomState(seed)
    t = np.arange(num_samples) / 16000
    freqs = 200 * (1.5 ** np.arange(NUM_EVENTS))
    examples = {}
    for i in range(num_examples):
        active = rng.rand(NUM_EVENTS) < 0.3
        if not active.any():
            active[rng.randint(NUM_EVENTS)] = True
        audio = 0.02 * rng.randn(num_samples)
        for e in np.flatnonzero(active):
            audio += 0.3 * np.sin(2 * np.pi * freqs[e] * t)
        examples[f'clip_{i}'] = {
            'example_id': f'clip_{i}',
            'audio_data': audio.astype('float32'),
            'seq_len': num_samples,
            'events': active.astype('float32'),
        }
    return lazy.from_dict(examples)


def prepare(dataset, batch_size=8, shuffle=True):
    stft = spk_data.STFT(**spk_data.STFT_PARAMS)

    def finalize(ex):
        return {
            'example_id': ex['example_id'],
            'stft': ex['stft'][None].astype('float32'),
            'seq_len': ex['seq_len'],
            'events': ex['events'],
        }

    dataset = dataset.map(stft).map(finalize)
    if shuffle:
        dataset = dataset.shuffle()

    def post(batch):
        batch = collate_fn(batch)
        stft_arr, seq_len = pad_batch(batch['stft'], axis=1)
        return {
            'example_id': list(batch['example_id']),
            'stft': stft_arr,
            'seq_len': np.asarray(batch['seq_len'], 'int32'),
            'events': np.stack(batch['events']),
        }

    return dataset.batch(batch_size).map(post)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--storage_root', default=None)
    parser.add_argument('--synthetic', action='store_true')
    parser.add_argument(
        '--database', default=None,
        help='JsonDatabase path: train on real data via data.py '
             '(AudioSet-style splits balanced_train/validate/eval)')
    parser.add_argument('--training_set', default='balanced_train')
    parser.add_argument('--epochs', type=int, default=20)
    parser.add_argument('--batch_size', type=int, default=8)
    args = parser.parse_args()

    if args.storage_root:
        from padertorch_tpu.io import get_new_subdir
        storage_dir = get_new_subdir(Path(args.storage_root) / 'tagging')
    else:
        from padertorch_tpu.io import get_new_storage_dir
        storage_dir = get_new_storage_dir('audio_tagging')

    ptrandom.seed(0)
    num_events = NUM_EVENTS
    real_data = None
    if args.database is not None and not args.synthetic:
        from . import data as real
        train, dev, _test = real.get_datasets(
            args.database,
            audio_reader={'target_sample_rate': 16000},
            stft=dict(spk_data.STFT_PARAMS),
            batch_size=args.batch_size,
            storage_dir=storage_dir,
            num_workers=2,
            training_set=args.training_set,
        )
        # label count comes from the encoder persisted by get_datasets
        import json as _json
        num_events = len(_json.loads(
            (Path(storage_dir) / 'eventss.json').read_text()))
        real_data = (train, dev)

    config = Trainer.get_config({
        'model': {'factory': WALNet, 'num_events': num_events},
        'optimizer': {'factory': pt.Adam, 'gradient_clipping': 10.0,
                      'lr': 3e-4},
        'storage_dir': str(storage_dir),
        'stop_trigger': (args.epochs, 'epoch'),
    })
    dump_config({'trainer': config}, storage_dir / 'config.json')
    from padertorch_tpu.contrib.examples._makefile import \
        write_recipe_makefile
    write_recipe_makefile(
        storage_dir, 'padertorch_tpu.contrib.examples.sound_recognition.audio_tagging.train',
        evaluate_module='padertorch_tpu.contrib.examples.sound_recognition.audio_tagging.evaluate',
        evaluate_args='--synthetic'
        if (getattr(args, 'synthetic', False)
            or getattr(args, 'database', None) is None)
        else '')
    trainer = Trainer.from_config(config)

    if real_data is not None:
        train, dev = real_data
        trainer.test_run(train, dev)
        trainer.register_validation_hook(dev, metric='mAP',
                                         maximize=True)
        trainer.train(train)
    else:
        train_ds = synthetic_database(num_examples=48)
        dev_ds = synthetic_database(
            num_examples=2 * args.batch_size, seed=1)
        train = prepare(train_ds, args.batch_size)
        dev = prepare(dev_ds, args.batch_size, shuffle=False)
        trainer.test_run(
            prepare(train_ds, args.batch_size, shuffle=False), dev)
        trainer.register_validation_hook(dev, metric='mAP',
                                         maximize=True)
        trainer.train(train.prefetch(2, 4))
    print(f'Finished. storage_dir={storage_dir}')


if __name__ == '__main__':
    main()
