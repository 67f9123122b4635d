"""Data-parallel mesh tests on the virtual 8-device CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp

import padertorch_tpu as pt
from padertorch_tpu import nn
from padertorch_tpu import random as ptrandom
from padertorch_tpu.module import partition
from padertorch_tpu.parallel import (
    make_mesh, DataParallel, replicate, shard_batch, data_sharding,
)


def test_mesh_and_shardings():
    mesh = make_mesh()
    assert mesh.shape['data'] == len(jax.devices())
    dp = DataParallel(mesh)
    batch = {'x': np.ones((16, 4), 'float32'), 'id': ['a'] * 16,
             'scalar': np.float32(1.0)}
    sharded = dp.shard(batch)
    assert len(sharded['x'].sharding.device_set) == len(jax.devices())
    assert sharded['id'] == ['a'] * 16  # host leaves pass through


def test_data_parallel_step_equals_single_device(tmp_path):
    """The sharded fused step computes the same update as unsharded."""
    from padertorch_tpu.train.trainer import Trainer
    from tests.test_train.test_trainer import MnistModel

    mesh = make_mesh()
    dp = DataParallel(mesh)

    def run(sharding, model_seed=0):
        ptrandom.seed(model_seed)
        model = MnistModel()
        if sharding is not None:
            model = replicate(model, mesh)
        trainer = Trainer(
            model=model, storage_dir=tmp_path / 'x',
            optimizer=pt.Adam(lr=1e-2), sharding=sharding)
        trainer.iteration = 0
        rng = np.random.RandomState(0)
        batch = {
            'image': rng.rand(16, 28, 28).astype('float32'),
            'digit': rng.randint(0, 10, 16).astype('int32'),
        }
        batch = trainer._example_to_device(batch)
        params, static = partition(trainer.model)
        step = trainer._get_fn('train', trainer._make_train_step)
        out = step(params, static, trainer._opt_states, batch,
                   jax.random.PRNGKey(0), None)
        return np.asarray(out[3]), jax.device_get(
            jax.tree_util.tree_leaves(out[0])[0])

    loss_dp, w_dp = run(dp)
    loss_single, w_single = run(None)
    np.testing.assert_allclose(loss_dp, loss_single, rtol=1e-5)
    np.testing.assert_allclose(w_dp, w_single, rtol=1e-4, atol=1e-6)


def test_data_parallel_pallas_lstm_step(tmp_path):
    """The Pallas LSTM cell-scan kernel composes with batch sharding:
    the sharded fused train step on the PIT BLSTM (backend='pallas',
    interpret mode on CPU) matches the unsharded step bit-for-bit."""
    from padertorch_tpu.train.trainer import Trainer
    from padertorch_tpu.models.bss import PermutationInvariantTrainingModel

    mesh = make_mesh()
    dp = DataParallel(mesh)
    b, t, f, k = 8, 10, 33, 2

    def run(sharding):
        ptrandom.seed(0)
        model = PermutationInvariantTrainingModel(
            F=f, recurrent_layers=1, units=32, K=k)
        model.blstm.backend = 'pallas'
        if sharding is not None:
            model = replicate(model, mesh)
        trainer = Trainer(
            model=model, storage_dir=tmp_path / 'x',
            optimizer=pt.Adam(lr=1e-3), sharding=sharding,
            loss_weights={'pit_mse_loss': 1.0, 'pit_ips_loss': 1.0})
        trainer.iteration = 0
        rng = np.random.RandomState(0)
        batch = {
            'Y_abs': np.abs(rng.randn(b, t, f)).astype('float32'),
            'X_abs': np.abs(rng.randn(b, t, k, f)).astype('float32'),
            'cos_phase_difference': np.cos(
                rng.randn(b, t, k, f)).astype('float32'),
            'num_frames': np.asarray([t, t - 3, t, t - 7] * (b // 4)),
        }
        batch = trainer._example_to_device(batch)
        params, static = partition(trainer.model)
        step = trainer._get_fn('train', trainer._make_train_step)
        out = step(params, static, trainer._opt_states, batch,
                   jax.random.PRNGKey(0), trainer._loss_weight_arrays())
        return np.asarray(out[3]), jax.device_get(
            jax.tree_util.tree_leaves(out[0])[0])

    loss_dp, w_dp = run(dp)
    loss_single, w_single = run(None)
    np.testing.assert_allclose(loss_dp, loss_single, rtol=1e-5)
    np.testing.assert_allclose(w_dp, w_single, rtol=1e-4, atol=1e-6)


def test_tensor_parallel_step_equals_single_device(tmp_path):
    """2D (data, model) mesh: batch over 'data', gate matrices
    column-sharded over 'model' — the fused step matches unsharded."""
    from padertorch_tpu.train.trainer import Trainer
    from padertorch_tpu.parallel.tensor import ModelParallel
    from padertorch_tpu.models.bss import PermutationInvariantTrainingModel

    b, t, f, k = 8, 20, 65, 2

    def run(mp):
        ptrandom.seed(0)
        model = PermutationInvariantTrainingModel(
            F=f, recurrent_layers=2, units=32, K=k)
        if mp is not None:
            model = mp.shard_module(model)
        trainer = Trainer(
            model=model, storage_dir=tmp_path / 'x',
            optimizer=pt.Adam(lr=1e-3), sharding=mp,
            loss_weights={'pit_mse_loss': 1.0, 'pit_ips_loss': 1.0})
        trainer.iteration = 0
        rng = np.random.RandomState(0)
        batch = {
            'Y_abs': np.abs(rng.randn(b, t, f)).astype('float32'),
            'X_abs': np.abs(rng.randn(b, t, k, f)).astype('float32'),
            'cos_phase_difference': np.cos(
                rng.randn(b, t, k, f)).astype('float32'),
            'num_frames': np.asarray([t, t - 3, t, t - 7] * (b // 4)),
        }
        batch = trainer._example_to_device(batch)
        params, static = partition(trainer.model)
        step = trainer._get_fn('train', trainer._make_train_step)
        out = step(params, static, trainer._opt_states, batch,
                   jax.random.PRNGKey(0), trainer._loss_weight_arrays())
        return np.asarray(out[3]), jax.device_get(
            jax.tree_util.tree_leaves(out[0])[0])

    mp = ModelParallel(data=4, model=2, min_size=0)
    # big matrices actually sharded over 'model'
    ptrandom.seed(0)
    probe = mp.shard_module(PermutationInvariantTrainingModel(
        F=f, recurrent_layers=2, units=32, K=k))
    w = probe.blstm.w_ih[0]
    assert len(w.sharding.device_set) == 8
    from jax.sharding import PartitionSpec as P
    assert w.sharding.spec == P(None, 'model'), w.sharding.spec

    loss_mp, w_mp = run(mp)
    loss_single, w_single = run(None)
    np.testing.assert_allclose(loss_mp, loss_single, rtol=1e-5)
    np.testing.assert_allclose(w_mp, w_single, rtol=1e-4, atol=1e-6)


def test_shard_map_value_and_grad_matches_single_device():
    """Explicit-collectives formulation (shard_map + psum) computes the
    same loss and gradients as the plain full-batch value_and_grad."""
    from padertorch_tpu.parallel.spmd import shard_map_value_and_grad
    from padertorch_tpu.models.bss import PermutationInvariantTrainingModel
    from padertorch_tpu.module import combine

    mesh = make_mesh()
    b, t, f, k = 8, 12, 33, 2
    ptrandom.seed(0)
    model = PermutationInvariantTrainingModel(
        F=f, recurrent_layers=1, units=16, K=k).eval()
    params, static = partition(model)
    rng = np.random.RandomState(0)
    batch = {
        'Y_abs': np.abs(rng.randn(b, t, f)).astype('float32'),
        'X_abs': np.abs(rng.randn(b, t, k, f)).astype('float32'),
        'cos_phase_difference':
            np.cos(rng.randn(b, t, k, f)).astype('float32'),
        'num_frames': np.full(b, t, dtype='int32'),
    }

    def loss_fn(params, batch):
        m = combine(params, static)
        return m.review(batch, m(batch))['losses']['pit_mse_loss']

    explicit = shard_map_value_and_grad(loss_fn, mesh)
    loss_sm, grads_sm = explicit(params, batch)

    loss_ref, grads_ref = jax.value_and_grad(loss_fn)(
        jax.tree_util.tree_map(jnp.asarray, params), batch)

    np.testing.assert_allclose(
        np.asarray(loss_sm), np.asarray(loss_ref), rtol=1e-6)
    for a, b_ in zip(jax.tree_util.tree_leaves(grads_sm),
                     jax.tree_util.tree_leaves(grads_ref)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-6)


def test_shard_host_local_batch_single_process_equals_shard_batch():
    from padertorch_tpu.parallel import shard_host_local_batch
    mesh = make_mesh()
    batch = {'x': np.arange(32, dtype='float32').reshape(16, 2),
             'meta': np.float32(3.0)}
    a = shard_batch(batch, mesh)
    b = shard_host_local_batch(batch, mesh)
    np.testing.assert_array_equal(np.asarray(a['x']), np.asarray(b['x']))
    assert a['x'].sharding == b['x'].sharding
    assert float(b['meta']) == 3.0


def test_zero_sharded_optimizer_state_matches_replicated(tmp_path):
    """ZeRO-1 (optimizer state sharded over the data axis) computes the
    same training trajectory as plain replicated data parallelism, and
    the moments actually live sharded."""
    from padertorch_tpu.train.trainer import Trainer
    from tests.test_train.test_trainer import MnistModel

    mesh = make_mesh()

    def run(zero):
        ptrandom.seed(0)
        model = replicate(MnistModel(), mesh)
        dp = DataParallel(mesh, zero=zero)
        trainer = Trainer(
            model=model, storage_dir=tmp_path / f'z{zero}',
            optimizer=pt.Adam(lr=1e-2), sharding=dp)
        trainer.iteration = 0
        rng = np.random.RandomState(0)
        step = trainer._get_fn('train', trainer._make_train_step)
        params, static = partition(trainer.model)
        opt_states = trainer._opt_states
        losses = []
        for i in range(3):
            batch = trainer._example_to_device({
                'image': rng.rand(16, 28, 28).astype('float32'),
                'digit': rng.randint(0, 10, 16).astype('int32'),
            })
            out = step(params, static, opt_states, batch,
                       jax.random.PRNGKey(i), None)
            params, static, opt_states = out[0], out[1], out[2]
            losses.append(float(np.asarray(out[3])))
        return losses, jax.device_get(
            jax.tree_util.tree_leaves(params)[0]), opt_states

    losses_zero, w_zero, opt_zero = run(True)
    losses_repl, w_repl, _ = run(False)
    np.testing.assert_allclose(losses_zero, losses_repl, rtol=1e-5)
    np.testing.assert_allclose(w_zero, w_repl, rtol=1e-4, atol=1e-6)
    # the large moment leaves must be sharded (not fully replicated)
    n = len(jax.devices())
    sharded_leaves = [
        leaf for leaf in jax.tree_util.tree_leaves(opt_zero)
        if hasattr(leaf, 'sharding') and leaf.ndim >= 1
        and leaf.shape[0] % n == 0 and leaf.shape[0] >= n
        and not leaf.sharding.is_fully_replicated
    ]
    assert sharded_leaves, 'no optimizer-state leaf is ZeRO-sharded'


def test_zero_sharding_survives_virtual_minibatch(tmp_path):
    """The accumulation apply step must also pin the ZeRO layout."""
    from padertorch_tpu.train.trainer import Trainer
    from tests.test_train.test_trainer import MnistModel

    mesh = make_mesh()
    ptrandom.seed(0)
    model = replicate(MnistModel(), mesh)
    dp = DataParallel(mesh, zero=True)
    trainer = Trainer(
        model=model, storage_dir=tmp_path,
        optimizer=pt.Adam(lr=1e-2), sharding=dp,
        virtual_minibatch_size=2, stop_trigger=(1, 'epoch'))
    rng = np.random.RandomState(0)
    data = [
        {'image': rng.rand(8, 28, 28).astype('float32'),
         'digit': rng.randint(0, 10, 8).astype('int32')}
        for _ in range(4)
    ]
    trainer.train(data)
    n = len(jax.devices())
    opt_leaves = jax.tree_util.tree_leaves(trainer._opt_states)
    sharded = [
        leaf for leaf in opt_leaves
        if hasattr(leaf, 'sharding') and leaf.ndim >= 1
        and leaf.shape[0] % n == 0 and leaf.shape[0] >= n
        and not leaf.sharding.is_fully_replicated
    ]
    assert sharded, 'ZeRO layout lost through the accumulation path'


def test_fsdp_matches_replicated_and_params_live_sharded(tmp_path):
    """FSDP (params + moments sharded over the data axis) computes the
    same trajectory as replicated DP, and the weights actually live
    sharded on the mesh."""
    from padertorch_tpu.train.trainer import Trainer
    from tests.test_train.test_trainer import MnistModel

    mesh = make_mesh()

    def run(fsdp):
        ptrandom.seed(0)
        model = MnistModel()
        if not fsdp:
            model = replicate(model, mesh)
        dp = DataParallel(mesh, fsdp=fsdp)
        trainer = Trainer(
            model=model, storage_dir=tmp_path / f'f{fsdp}',
            optimizer=pt.Adam(lr=1e-2), sharding=dp)
        trainer.iteration = 0
        rng = np.random.RandomState(0)
        step = trainer._get_fn('train', trainer._make_train_step)
        params, static = partition(trainer.model)
        opt_states = trainer._opt_states
        losses = []
        for i in range(3):
            batch = trainer._example_to_device({
                'image': rng.rand(16, 28, 28).astype('float32'),
                'digit': rng.randint(0, 10, 16).astype('int32'),
            })
            out = step(params, static, opt_states, batch,
                       jax.random.PRNGKey(i), None)
            params, static, opt_states = out[0], out[1], out[2]
            losses.append(float(np.asarray(out[3])))
        return losses, params

    losses_fsdp, params_fsdp = run(True)
    losses_repl, params_repl = run(False)
    np.testing.assert_allclose(losses_fsdp, losses_repl, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(params_fsdp),
                    jax.tree_util.tree_leaves(params_repl)):
        np.testing.assert_allclose(
            jax.device_get(a), jax.device_get(b), rtol=1e-4, atol=1e-6)
    # the big weight must be sharded after the step, not replicated
    n = len(jax.devices())
    sharded = [
        leaf for leaf in jax.tree_util.tree_leaves(params_fsdp)
        if hasattr(leaf, 'sharding') and leaf.ndim >= 1
        and leaf.shape[0] % n == 0 and leaf.shape[0] >= n
        and not leaf.sharding.is_fully_replicated
    ]
    assert sharded, 'no parameter leaf is FSDP-sharded'


def test_fsdp_full_training_with_checkpoints(tmp_path):
    """FSDP end-to-end through Trainer.train incl. checkpoint save."""
    from padertorch_tpu.train.trainer import Trainer
    from tests.test_train.test_trainer import MnistModel, get_datasets

    mesh = make_mesh()
    ptrandom.seed(0)
    tr, dt = get_datasets()
    trainer = Trainer(
        model=MnistModel(), storage_dir=tmp_path,
        optimizer=pt.Adam(lr=1e-2), sharding=DataParallel(mesh, fsdp=True),
        stop_trigger=(2, 'epoch'))
    trainer.register_validation_hook(dt)
    trainer.train(tr)
    assert (tmp_path / 'checkpoints' / 'ckpt_latest.ptt').exists()


def test_adversarial_data_parallel_step_equals_single_device(tmp_path):
    """GAN-style per-key objectives compose with DP sharding: the
    sharded adversarial step computes the same per-submodule updates
    as the unsharded one."""
    from padertorch_tpu.train.trainer import Trainer
    from tests.test_train.test_adversarial import LinearGAN

    mesh = make_mesh()
    dp = DataParallel(mesh)

    def run(sharding):
        ptrandom.seed(0)
        model = LinearGAN()
        if sharding is not None:
            model = replicate(model, mesh)
        trainer = Trainer(
            model=model, storage_dir=tmp_path / 'x',
            optimizer={
                'generator': pt.SGD(lr=0.1),
                'discriminator': pt.SGD(lr=0.1),
            },
            adversarial=True, sharding=sharding)
        trainer.iteration = 0
        rng = np.random.RandomState(0)
        batch = {
            'z': rng.randn(16).astype('float32'),
            'x': rng.randn(16).astype('float32') + 3.0,
        }
        batch = trainer._example_to_device(batch)
        params, static = partition(trainer.model)
        step = trainer._get_fn('train', trainer._make_train_step)
        out = step(params, static, trainer._opt_states, batch,
                   jax.random.PRNGKey(0), None)
        new_params = out[0]
        return (np.asarray(out[3]),
                np.asarray(new_params.generator.a),
                np.asarray(new_params.discriminator.w))

    loss_dp, a_dp, w_dp = run(dp)
    loss_single, a_single, w_single = run(None)
    np.testing.assert_allclose(loss_dp, loss_single, rtol=1e-5)
    np.testing.assert_allclose(a_dp, a_single, rtol=1e-5)
    np.testing.assert_allclose(w_dp, w_single, rtol=1e-5)
