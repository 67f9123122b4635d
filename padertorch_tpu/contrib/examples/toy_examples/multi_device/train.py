"""Data-parallel training demo over a device mesh.

Reference parity: ``contrib/examples/toy_examples/multi_gpu/train.py`` —
there: threads + replicate/parallel_apply/gather over GPUs; here: one
sharding over a ``('data',)`` mesh (works on N TPU chips or a virtual
CPU mesh).

Run on an 8-device virtual CPU mesh:
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python -m padertorch_tpu.contrib.examples.toy_examples.multi_device.train
"""
import numpy as np
import jax
import jax.numpy as jnp

import padertorch_tpu as pt
from padertorch_tpu import nn
from padertorch_tpu import random as ptrandom
from padertorch_tpu.data import dataset as lazy
from padertorch_tpu.parallel import make_mesh, DataParallel, replicate


class Regression(pt.Model):
    def __init__(self, in_features=8):
        self.net = nn.Sequential(
            nn.Linear(in_features, 32), nn.ReLU(), nn.Linear(32, 1))

    def forward(self, batch):
        return self.net(batch['x'])[:, 0]

    def review(self, batch, out):
        return {'loss': jnp.mean((out - batch['y']) ** 2)}


def make_dataset(n=256, batch_size=None, seed=0):
    rng = np.random.RandomState(seed)
    w = rng.randn(8)
    xs = rng.randn(n, 8).astype('float32')
    ys = (xs @ w + 0.01 * rng.randn(n)).astype('float32')
    batch_size = batch_size or 8 * len(jax.devices())
    examples = [
        {'x': xs[i:i + batch_size], 'y': ys[i:i + batch_size]}
        for i in range(0, n - batch_size + 1, batch_size)
    ]
    return lazy.from_list(examples)


def main():
    mesh = make_mesh()
    print(f'Training data-parallel over {mesh.shape} mesh '
          f'({len(jax.devices())} devices)')
    dp = DataParallel(mesh)
    ptrandom.seed(0)
    model = replicate(Regression(), mesh)
    import tempfile
    with tempfile.TemporaryDirectory() as storage:
        trainer = pt.Trainer(
            model=model,
            storage_dir=storage,
            optimizer=pt.Adam(lr=1e-2),
            stop_trigger=(20, 'epoch'),
            sharding=dp,
        )
        ds = make_dataset()
        trainer.train(ds)
    print('done')


if __name__ == '__main__':
    main()
