"""Mixed-precision (bf16 compute / f32 master) trainer policy
(``padertorch_tpu/train/precision.py``)."""
import numpy as np
import jax
import jax.numpy as jnp

import padertorch_tpu as pt
from padertorch_tpu import nn
from padertorch_tpu import random as ptrandom
from padertorch_tpu.module import partition
from padertorch_tpu.train.precision import Precision

from .test_trainer import MnistModel, get_datasets, make_trainer


def test_cast_floating_and_restore():
    p = Precision('bfloat16')
    tree = {
        'w': jnp.ones((3,), jnp.float32),
        'i': jnp.arange(3),
        'b': jnp.asarray([True, False, True]),
        'c': jnp.ones((2,), jnp.complex64),
        's': 1.5,
    }
    cast = p.cast_floating(tree)
    assert cast['w'].dtype == jnp.bfloat16
    assert cast['i'].dtype == tree['i'].dtype
    assert cast['b'].dtype == jnp.bool_
    assert cast['c'].dtype == jnp.complex64
    assert cast['s'].dtype == jnp.bfloat16  # python float is floating
    restored = p.restore_dtypes(cast, tree)
    assert restored['w'].dtype == jnp.float32
    assert restored['c'].dtype == jnp.complex64


def _final_params(trainer):
    params, _ = partition(trainer.model)
    return jax.tree_util.tree_leaves(params)


def test_trainer_bf16_master_params_stay_f32(tmp_path):
    tr, dt = get_datasets()
    trainer = make_trainer(tmp_path, precision='bfloat16')
    assert isinstance(trainer.precision, Precision)
    trainer.register_validation_hook(dt)
    trainer.train(tr)
    for leaf in _final_params(trainer):
        assert leaf.dtype == jnp.float32
    # gradients actually flowed: params differ from init
    ptrandom.seed(0)
    init = jax.tree_util.tree_leaves(partition(MnistModel())[0])
    deltas = [float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
              for a, b in zip(_final_params(trainer), init)]
    assert max(deltas) > 1e-3, deltas


def test_bf16_trajectory_tracks_f32(tmp_path):
    """Two epochs bf16 vs f32 land near each other on this tiny model."""
    tr, _ = get_datasets()
    t32 = make_trainer(tmp_path / 'f32')
    t32.train(tr)
    t16 = make_trainer(tmp_path / 'bf16', precision='bfloat16')
    t16.train(tr)
    for a, b in zip(_final_params(t32), _final_params(t16)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-2)


def test_bf16_test_run(tmp_path):
    """The burn test (determinism + loss-change) passes under bf16."""
    tr, dt = get_datasets()
    trainer = make_trainer(tmp_path, precision='bfloat16')
    trainer.test_run(tr, dt)


class NormalizedModel(pt.Model):
    """Model with running-statistics buffers (InputNormalization)."""

    def __init__(self):
        from padertorch_tpu.modules.normalization import InputNormalization
        self.norm = InputNormalization(
            data_format='bc', shape=(None, 28 * 28), statistics_axis='b',
            sequence_axis=None)
        self.net = nn.Linear(28 * 28, 10)

    def forward(self, inputs):
        image = inputs['image']
        x = jnp.reshape(image, (image.shape[0], -1))
        x = self.norm(x)
        return self.net(x)

    def review(self, inputs, outputs):
        digits = inputs['digit']
        logp = jax.nn.log_softmax(outputs)
        loss = -jnp.mean(
            jnp.take_along_axis(logp, digits[:, None], axis=1))
        return {'loss': loss}


def test_bf16_preserves_buffer_dtypes(tmp_path):
    from padertorch_tpu.train.trainer import Trainer
    tr, _ = get_datasets()
    ptrandom.seed(0)
    trainer = Trainer(
        model=NormalizedModel(),
        storage_dir=tmp_path,
        optimizer=pt.Adam(lr=1e-2),
        stop_trigger=(1, 'epoch'),
        precision='bfloat16',
    )
    trainer.train(tr)
    _, static = partition(trainer.model)
    dtypes = {
        np.dtype(leaf.dtype).name
        for leaf in jax.tree_util.tree_leaves(static)
        if hasattr(leaf, 'dtype')
        and jnp.issubdtype(leaf.dtype, jnp.floating)
    }
    assert dtypes == {'float32'}, dtypes
    # running stats moved away from init (they updated during forward)
    mean = np.asarray(trainer.model.norm.running_mean)
    assert np.max(np.abs(mean)) > 1e-3
