"""MNIST toy example: pt.Trainer vs. a hand-written loop.

Reference parity: ``contrib/examples/toy_examples/mnist/mnist_example.py``.

Run:
    python -m padertorch_tpu.contrib.examples.toy_examples.mnist.mnist_example
"""
import numpy as np
import jax
import jax.numpy as jnp

import padertorch_tpu as pt
from padertorch_tpu import nn
from padertorch_tpu import random as ptrandom
from padertorch_tpu.data import collate_fn
from padertorch_tpu.testing import MnistDatabase


class FeedForwardNet(pt.Module):
    """Two-layer perceptron (ref ``mnist_example.py:29``).

    >>> ptrandom.seed(0)
    >>> net = FeedForwardNet(layer_size=32)
    >>> net(jnp.ones((2, 28, 28))).shape
    (2, 10)
    """

    def __init__(self, layer_size=800):
        self.layer_size = layer_size
        self.fc1 = nn.Linear(28 * 28, layer_size)
        self.fc2 = nn.Linear(layer_size, 10)

    def forward(self, x):
        x = jnp.reshape(x, (-1, 28 * 28))
        return self.fc2(jax.nn.relu(self.fc1(x)))


def cnt_params(net):
    """Total parameter count (ref ``mnist_example.py:83``).

    >>> ptrandom.seed(0)
    >>> cnt_params(FeedForwardNet(layer_size=800))
    636010
    """
    from padertorch_tpu.module import partition
    params, _ = partition(net)
    return sum(int(np.prod(np.shape(leaf)))
               for leaf in jax.tree_util.tree_leaves(params))


class MnistModel(pt.Model):
    @classmethod
    def finalize_dogmatic_config(cls, config):
        config['net'] = {
            'factory': nn.Linear,
            'in_features': 28 * 28,
            'out_features': 10,
        }

    def __init__(self, net):
        self.net = net

    def forward(self, inputs):
        image = inputs['image']
        return self.net(jnp.reshape(image, (image.shape[0], -1)))

    def review(self, inputs, outputs):
        digits = inputs['digit']
        logp = jax.nn.log_softmax(outputs)
        ce = -jnp.mean(jnp.take_along_axis(logp, digits[:, None], 1))
        accuracy = jnp.mean(
            (jnp.argmax(outputs, -1) == digits).astype('float32'))
        return {'loss': ce, 'scalars': {'accuracy': accuracy}}


# Reference name (mnist_example.py:45): the Model wrapper around a
# plain net — same net-in-constructor shape as MnistModel.
PadertorchModel = MnistModel


def get_datasets(batch_size=32):
    db = MnistDatabase()

    def prepare(batch):
        batch = collate_fn(batch)
        return {
            'image': np.stack(batch['image']).astype('float32'),
            'digit': np.array(batch['digit'], dtype='int32'),
        }

    train = db.get_dataset('train').shuffle().batch(batch_size).map(prepare)
    test = db.get_dataset('test').batch(batch_size).map(prepare)
    return train, test


def train_with_trainer(storage_dir, epochs=5):
    """The framework way: burn test, then Trainer.train."""
    ptrandom.seed(0)
    trainer = pt.Trainer(
        model=MnistModel.new(),
        storage_dir=storage_dir,
        optimizer=pt.Adam(lr=1e-2),
        stop_trigger=(epochs, 'epoch'),
    )
    train, test = get_datasets()
    trainer.test_run(train, test)
    trainer.register_validation_hook(test)
    trainer.train(train.prefetch(2, 4))
    return trainer


def train_by_hand(epochs=5):
    """The same training without the Trainer (for comparison)."""
    from padertorch_tpu.module import partition, combine
    ptrandom.seed(0)
    model = MnistModel.new()
    train, test = get_datasets()
    params, static = partition(model)
    optimizer = pt.Adam(lr=1e-2).set_parameters(params)

    @jax.jit
    def step(params, opt_state, batch):
        def loss_fn(p):
            m = combine(p, static)
            with pt.random.key_context(jax.random.PRNGKey(0)):
                out = m(batch)
                return m.review(batch, out)['loss']
        loss, grads = jax.value_and_grad(loss_fn)(params)
        new_params, new_state, _ = optimizer.step(
            params, grads, opt_state)
        return new_params, new_state, loss

    opt_state = optimizer.opt_state
    for epoch in range(epochs):
        for batch in train:
            params, opt_state, loss = step(params, opt_state, batch)
        print(f'epoch {epoch}: loss={float(loss):.4f}')
    return combine(params, static)


if __name__ == '__main__':
    import tempfile
    with tempfile.TemporaryDirectory() as storage_dir:
        train_with_trainer(storage_dir, epochs=2)
    train_by_hand(epochs=2)
