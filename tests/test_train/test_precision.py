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


def _one_bf16_step(trainer, batch):
    """One fused train step under the bf16 policy; returns the loss."""
    trainer.iteration = 0
    params, static = partition(trainer.model)
    step = trainer._get_fn('train', trainer._make_train_step)
    out = step(params, static, trainer._opt_states, batch,
               jax.random.PRNGKey(0), trainer._loss_weight_arrays())
    loss = float(np.asarray(jax.tree_util.tree_leaves(out[3])[0]))
    assert np.isfinite(loss), loss
    return loss


def test_bf16_policy_model_zoo(tmp_path):
    """One bf16-policy train step for each major model family.

    The policy casts example leaves and params to bfloat16; every op
    class must survive the mixed stream (``lax.conv`` does NOT promote
    mixed dtypes, scan carries must keep their dtype across steps —
    a carry-dtype regression crashed the whole TasNet family once).
    """
    from padertorch_tpu.train.trainer import Trainer

    rng = np.random.RandomState(0)

    def tasnet_trainer(variant, sep_small):
        from padertorch_tpu.contrib.examples.source_separation.tasnet \
            .train import get_trainer_config
        ptrandom.seed(0)
        return Trainer.from_config(get_trainer_config(
            tmp_path / variant, variant=variant,
            updates={'precision': 'bfloat16',
                     'model': {'separator': sep_small,
                               'encoder': {'feature_size': 16}}}))

    wave_batch = {
        'y': jnp.asarray(rng.randn(2, 2000).astype('float32')),
        's': jnp.asarray(rng.randn(2, 2, 2000).astype('float32')),
        'num_samples': jnp.asarray([2000, 1600], 'int32'),
    }

    # TasNet encoder/decoder convs + DPRNN (chunked BLSTMs)
    _one_bf16_step(tasnet_trainer('dprnn', {
        'input_size': 16, 'rnn_size': 8, 'window_length': 10,
        'hop_size': 5, 'num_blocks': 1}), wave_batch)
    # TCN: dilated depthwise convs + gLN
    _one_bf16_step(tasnet_trainer('convnet', {
        'input_size': 16, 'num_blocks': 2, 'num_repeats': 1,
        'hidden_channels': 16}), wave_batch)
    # dual-path transformer (attention + layernorm)
    _one_bf16_step(tasnet_trainer('sepformer', {
        'input_size': 16, 'window_length': 10, 'hop_size': 5,
        'num_blocks': 1, 'num_layers_intra': 1, 'num_layers_inter': 1,
        'num_heads': 2}), wave_batch)

    # PIT BLSTM: InputNormalization running buffers + BLSTM + PIT loss
    from padertorch_tpu.models.bss import (
        PermutationInvariantTrainingModel)
    ptrandom.seed(0)
    pit = Trainer(
        model=PermutationInvariantTrainingModel(
            F=17, recurrent_layers=1, units=8, K=2),
        storage_dir=tmp_path / 'pit', optimizer=pt.Adam(),
        stop_trigger=(1, 'epoch'), precision='bfloat16',
        loss_weights={'pit_mse_loss': 1.0, 'pit_ips_loss': 0.0})
    _one_bf16_step(pit, {
        'Y_abs': jnp.asarray(np.abs(rng.randn(2, 12, 17)), jnp.float32),
        'X_abs': jnp.asarray(
            np.abs(rng.randn(2, 12, 2, 17)), jnp.float32),
        'cos_phase_difference': jnp.asarray(
            np.cos(rng.randn(2, 12, 2, 17)), jnp.float32),
        'num_frames': jnp.asarray([12, 9]),
    })

    # mask estimator: InputNormalization + BLSTM + sigmoid BCE
    from padertorch_tpu.models.mask_estimator import SimpleMaskEstimator
    ptrandom.seed(0)
    mask = Trainer(
        model=SimpleMaskEstimator(num_features=17, num_units=8),
        storage_dir=tmp_path / 'mask', optimizer=pt.Adam(),
        stop_trigger=(1, 'epoch'), precision='bfloat16')
    _one_bf16_step(mask, {
        'observation_abs': jnp.asarray(
            np.abs(rng.randn(2, 12, 17)), jnp.float32),
        'speech_mask_target': jnp.asarray(
            (rng.rand(2, 12, 17) > 0.5), jnp.float32),
        'noise_mask_target': jnp.asarray(
            (rng.rand(2, 12, 17) > 0.5), jnp.float32),
        'num_frames': jnp.asarray([12, 9]),
    })

    # WaveNet vocoder: embedding + dilated causal convs + transpose-conv
    # conditioning upsampler + mu-law targets
    from padertorch_tpu.contrib.examples.audio_synthesis.wavenet \
        .model import WaveNetVocoder
    ptrandom.seed(0)
    cfg = WaveNetVocoder.get_config({'wavenet': {
        'n_layers': 2, 'max_dilation': 2, 'n_residual_channels': 8,
        'n_skip_channels': 16, 'n_cond_channels': 8,
        'upsamp_window': 20, 'upsamp_stride': 10}})
    wn = Trainer(
        model=WaveNetVocoder.from_config(cfg),
        storage_dir=tmp_path / 'wavenet', optimizer=pt.Adam(),
        stop_trigger=(1, 'epoch'), precision='bfloat16')
    _one_bf16_step(wn, {
        'features': jnp.asarray(rng.randn(2, 8, 6), jnp.float32),
        'audio_data': jnp.asarray(
            rng.randn(2, 80).clip(-0.99, 0.99), jnp.float32),
    })


def test_bf16_policy_pallas_rnn_full_trainer(tmp_path):
    """Regression: bf16 policy + ``backend='pallas'`` RNN through the
    FULL Trainer loop (train + validation hook) on CPU.

    XLA-CPU's DotThunk cannot execute several bf16 x bf16 -> f32 dot
    layouts (kernel-layout gates einsum, interpret-mode while-body
    dots) at RUNTIME — compilation succeeds, execution dies with
    UNIMPLEMENTED.  The pallas route therefore keeps its projection and
    interpret-mode recurrence in f32 off-TPU (see
    ``_RNNBase._pallas_gates_x`` / the kernels' ``interpret`` guard);
    this test drives the whole loop to prove no such dot survives."""
    from padertorch_tpu.modules.fully_connected import (
        fully_connected_stack,
    )
    from padertorch_tpu.modules.recurrent import LSTM
    from padertorch_tpu.train.trainer import Trainer

    class SeqModel(pt.Model):
        def __init__(self):
            self.rnn = LSTM(8, 16, num_layers=2, bidirectional=True)
            self.rnn.backend = 'pallas'
            self.head = fully_connected_stack(
                32, hidden_size=[16], output_size=4, dropout=0.0)

        def forward(self, inputs):
            out, _ = self.rnn(inputs['x'], seq_lens=inputs['lens'])
            return self.head(out)

        def review(self, inputs, outputs):
            return {'loss': jnp.mean((outputs - inputs['y']) ** 2)}

    rng = np.random.RandomState(0)
    examples = [
        {'x': rng.randn(3, 20, 8).astype('float32'),
         'lens': np.asarray([20, 15, 9]),
         'y': rng.randn(3, 20, 4).astype('float32')}
        for _ in range(6)
    ]
    ptrandom.seed(0)
    trainer = Trainer(
        model=SeqModel(), storage_dir=tmp_path,
        optimizer=pt.Adam(lr=1e-3), precision='bfloat16',
        stop_trigger=(2, 'epoch'))
    trainer.register_validation_hook(examples[:2])
    trainer.train(examples)
    ckpts = [p.name for p in (tmp_path / 'checkpoints').iterdir()]
    assert any(n.startswith('ckpt_') for n in ckpts), ckpts


def test_bf16_policy_pallas_resume(tmp_path):
    """Checkpoint + resume of a bf16-policy training whose RNN uses the
    pallas backend: optimizer state and f32 master params must round
    trip through the .ptt format and continue training."""
    from padertorch_tpu.modules.fully_connected import (
        fully_connected_stack,
    )
    from padertorch_tpu.modules.recurrent import LSTM
    from padertorch_tpu.train.trainer import Trainer

    class M(pt.Model):
        def __init__(self):
            self.rnn = LSTM(8, 16, num_layers=1, bidirectional=True)
            self.rnn.backend = 'pallas'
            self.head = fully_connected_stack(
                32, hidden_size=[8], output_size=4, dropout=0.0)

        def forward(self, inputs):
            out, _ = self.rnn(inputs['x'])
            return self.head(out)

        def review(self, inputs, outputs):
            return {'loss': jnp.mean((outputs - inputs['y']) ** 2)}

    rng = np.random.RandomState(0)
    exs = [{'x': rng.randn(2, 10, 8).astype('float32'),
            'y': rng.randn(2, 10, 4).astype('float32')}
           for _ in range(4)]
    ptrandom.seed(0)
    t1 = Trainer(model=M(), storage_dir=tmp_path, optimizer=pt.Adam(),
                 precision='bfloat16', stop_trigger=(1, 'epoch'))
    t1.train(exs)
    ptrandom.seed(0)
    t2 = Trainer(model=M(), storage_dir=tmp_path, optimizer=pt.Adam(),
                 precision='bfloat16', stop_trigger=(2, 'epoch'))
    t2.load_checkpoint()
    assert t2.iteration == t1.iteration
    t2.train(exs, resume=True)
    assert t2.iteration == 2 * t1.iteration
    for leaf in _final_params(t2):
        assert leaf.dtype == jnp.float32
