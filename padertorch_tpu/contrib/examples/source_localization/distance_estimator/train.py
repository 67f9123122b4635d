"""Source distance estimation from STFT features (CRNN regression).

Reference parity:
``contrib/examples/source_localization/distance_estimator`` — CRNN over
STFT/ILD/IPD features predicting source distance; reported as
mae/rmse/accuracy.

Run (synthetic smoke):
    python -m padertorch_tpu.contrib.examples.source_localization.distance_estimator.train \
        --storage_root /tmp/dist --synthetic --epochs 3
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
from padertorch_tpu.data.utils import collate_fn
from padertorch_tpu.contrib.je.modules.conv import CNN2d
from padertorch_tpu.contrib.je.modules.reduce import Mean
from padertorch_tpu.modules.recurrent import GRU
from padertorch_tpu.io import dump_config
from padertorch_tpu.ops._stft import STFT
from padertorch_tpu.train.trainer import Trainer

F = 129
_stft = STFT(256, 64, fading='full', complex_representation='complex',
             dtype='float32')


class DistanceEstimator(Model):
    """CNN2d + GRU regression head on 2-channel STFT features."""

    @classmethod
    def finalize_dogmatic_config(cls, config):
        config['cnn'] = {
            'factory': CNN2d,
            'in_channels': 3,  # log |X| ch0, ILD, cos IPD
            'out_channels': [16, 32],
            'kernel_size': 3,
            'pool_size': [2, 2],
            'norm': 'batch',
        }

    def __init__(self, cnn, hidden_size=64):
        self.cnn = cnn
        freq_after = F
        for _ in range(2):  # VALID max-pool k=2, s=2 per CNN layer
            freq_after = (freq_after - 2) // 2 + 1
        self.gru = GRU(cnn.out_channels * freq_after, hidden_size)
        self.pool = Mean(axis=1)
        self.head = nn.Linear(hidden_size, 1)

    def forward(self, inputs):
        h, seq_len = self.cnn(inputs['features'],
                              inputs.get('num_frames'))
        b, c, m, t = h.shape
        h = jnp.transpose(h, (0, 3, 1, 2)).reshape(b, t, c * m)
        h, _ = self.gru(h, seq_lens=seq_len)
        h = self.pool(h, seq_len)
        return self.head(h)[:, 0]

    def review(self, inputs, outputs):
        target = inputs['distance']
        err = outputs - target
        mse = jnp.mean(err ** 2)
        return {
            'loss': mse,
            'scalars': {
                'mae': jnp.mean(jnp.abs(err)),
                'rmse': jnp.sqrt(mse),
                'accuracy': jnp.mean(
                    (jnp.abs(err) < 0.25).astype('float32')),
            },
        }


def synthetic_database(num_examples=48, num_samples=8000, seed=0):
    """2-mic scenes: distance controls direct-to-reverb ratio and delay."""
    rng = np.random.RandomState(seed)
    examples = {}
    for i in range(num_examples):
        distance = float(rng.uniform(0.5, 3.0))
        src = rng.randn(num_samples)
        delay = int(distance * 4)
        direct = 1.0 / distance
        ch0 = direct * src + 0.2 * rng.randn(num_samples)
        ch1 = direct * np.roll(src, delay) + 0.2 * rng.randn(num_samples)
        examples[f'scene_{i}'] = {
            'example_id': f'scene_{i}',
            'observation': np.stack([ch0, ch1]).astype('float32'),
            'distance': distance,
        }
    return lazy.from_dict(examples)


def transform(ex):
    spec = np.asarray(_stft(ex['observation']))  # (2, T, F)
    log_mag = np.log(np.abs(spec[0]) + 1e-6)
    ild = np.log(np.abs(spec[0]) + 1e-6) - np.log(np.abs(spec[1]) + 1e-6)
    ipd = np.cos(np.angle(spec[0]) - np.angle(spec[1]))
    features = np.stack([log_mag, ild, ipd])  # (3, T, F)
    return {
        'example_id': ex['example_id'],
        'features': np.swapaxes(features, 1, 2).astype('float32'),
        'num_frames': spec.shape[1],
        'distance': np.float32(ex['distance']),
    }


def prepare(dataset, batch_size=8, shuffle=True):
    dataset = dataset.map(transform)
    if shuffle:
        dataset = dataset.shuffle()

    def post(batch):
        batch = collate_fn(batch)
        return {
            'example_id': list(batch['example_id']),
            'features': np.stack(batch['features']),
            'num_frames': np.asarray(batch['num_frames'], 'int32'),
            'distance': np.asarray(batch['distance'], 'float32'),
        }

    return dataset.batch(batch_size).map(post)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--storage_root', default=None)
    parser.add_argument('--synthetic', action='store_true')
    parser.add_argument('--epochs', type=int, default=20)
    parser.add_argument('--batch_size', type=int, default=8)
    args = parser.parse_args()

    if args.storage_root:
        from padertorch_tpu.io import get_new_subdir
        storage_dir = get_new_subdir(Path(args.storage_root) / 'distance')
    else:
        from padertorch_tpu.io import get_new_storage_dir
        storage_dir = get_new_storage_dir('distance_estimator')

    ptrandom.seed(0)
    config = Trainer.get_config({
        'model': {'factory': DistanceEstimator},
        'optimizer': {'factory': pt.Adam, 'gradient_clipping': 10.0,
                      'lr': 1e-3},
        'storage_dir': str(storage_dir),
        'stop_trigger': (args.epochs, 'epoch'),
    })
    dump_config({'trainer': config}, storage_dir / 'config.json')
    trainer = Trainer.from_config(config)

    train_ds = synthetic_database(num_examples=48)
    dev_ds = synthetic_database(num_examples=2 * args.batch_size, seed=1)
    train = prepare(train_ds, args.batch_size)
    dev = prepare(dev_ds, args.batch_size, shuffle=False)
    trainer.test_run(prepare(train_ds, args.batch_size, shuffle=False),
                     dev)
    trainer.register_validation_hook(dev, metric='mae')
    trainer.train(train.prefetch(2, 4))
    print(f'Finished. storage_dir={storage_dir}')


if __name__ == '__main__':
    main()
