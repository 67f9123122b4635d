"""LoRA adapters: identity at init, only-A/B-trainable partition, a
real gradient step that moves only the adapters, exact merge-back, and
composition with wav2vec2 + serving export."""
import numpy as np

import jax
import jax.numpy as jnp

import padertorch_tpu as pt
from padertorch_tpu import nn
from padertorch_tpu import random as ptrandom
from padertorch_tpu.lora import (
    LoRALinear, apply_lora, mark_only_lora_trainable, merge_lora)
from padertorch_tpu.module import combine, partition


def _x(shape, seed):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=shape).astype('float32'))


def test_identity_at_init_and_targets():
    ptrandom.seed(0)
    from padertorch_tpu.contrib.mk.modules.transformer import (
        MultiheadAttention)
    mha = MultiheadAttention(16, 4).eval()
    x = _x((2, 6, 16), 1)
    before = mha(x)
    n = apply_lora(mha, rank=4, targets=('q_proj', 'v_proj'))
    assert n == 2
    assert isinstance(mha.q_proj, LoRALinear)
    assert isinstance(mha.k_proj, nn.Linear)  # not targeted
    np.testing.assert_allclose(
        np.asarray(mha(x)), np.asarray(before), rtol=1e-6)


def test_partition_yields_only_adapters():
    ptrandom.seed(1)
    from padertorch_tpu.contrib.mk.modules.transformer import (
        TransformerEncoder)
    enc = TransformerEncoder(
        d_model=16, num_layers=2, num_heads=4).eval()
    apply_lora(enc, rank=2)
    frozen_n = mark_only_lora_trainable(enc)
    assert frozen_n > 0
    trainable, frozen = partition(enc)
    leaves = jax.tree_util.tree_leaves(trainable)
    # 2 layers x (4 attention proj + 2 ffn) x (A, B)
    assert len(leaves) == 2 * 6 * 2
    assert all(l.shape[0] == 2 or l.shape[1] == 2 for l in leaves)


def test_gradient_step_moves_only_adapters():
    ptrandom.seed(2)

    class M(pt.Module):
        def __init__(self):
            self.lin = nn.Linear(8, 8)
            self.out = nn.Linear(8, 2)

        def forward(self, x):
            return self.out(jax.nn.relu(self.lin(x)))

    m = M().eval()
    apply_lora(m, rank=2)
    mark_only_lora_trainable(m)
    x, y = _x((4, 8), 3), _x((4, 2), 4)
    trainable, static = partition(m)

    def loss(tr):
        model = combine(tr, static)
        return jnp.mean((model(x) - y) ** 2)

    grads = jax.grad(loss)(trainable)
    g_leaves = jax.tree_util.tree_leaves(grads)
    assert len(g_leaves) == 4  # (A, B) x 2 layers
    assert any(float(jnp.abs(g).max()) > 0 for g in g_leaves)

    # one SGD step changes the output; the base weights are untouched
    stepped = jax.tree_util.tree_map(
        lambda p, g: p - 0.5 * g, trainable, grads)
    m2 = combine(stepped, static)
    assert np.abs(np.asarray(m2(x)) - np.asarray(m(x))).max() > 1e-6
    np.testing.assert_array_equal(
        np.asarray(m2.lin.weight), np.asarray(m.lin.weight))


def test_merge_is_exact_and_serves():
    ptrandom.seed(3)

    class M(pt.Module):
        def __init__(self):
            self.lin = nn.Linear(16, 8)

        def forward(self, x):
            return self.lin(x)

    m = M().eval()
    apply_lora(m, rank=4)
    # give the adapter a non-trivial delta
    m.lin.lora_b = _x((4, 8), 5) * 0.1
    x = _x((3, 16), 6)
    want = m(x)
    n = merge_lora(m)
    assert n == 1 and type(m.lin) is nn.Linear
    np.testing.assert_allclose(np.asarray(m(x)), np.asarray(want),
                               rtol=1e-5, atol=1e-6)
    # merged model exports like any dense model
    from padertorch_tpu.serve import export_fn, load_exported
    blob = export_fn(lambda b: m(b), np.asarray(x))
    np.testing.assert_allclose(
        np.asarray(load_exported(blob)(np.asarray(x))),
        np.asarray(want), rtol=1e-5, atol=1e-6)


def test_wav2vec2_lora_finetune_surface():
    ptrandom.seed(4)
    from padertorch_tpu.contrib.mk.modules.features.wav2vec2 import (
        Wav2Vec2Model)
    m = Wav2Vec2Model(
        conv_dim=(16, 16), conv_kernel=(3, 3), conv_stride=(2, 2),
        d_model=16, num_layers=2, num_heads=2, d_ff=32).eval()
    n = apply_lora(m, rank=2, targets=('q_proj', 'v_proj'))
    assert n == 2 * 2  # per encoder layer
    mark_only_lora_trainable(m)
    trainable, static = partition(m)
    n_trainable = sum(
        l.size for l in jax.tree_util.tree_leaves(trainable))
    wav = _x((2, 400), 7)

    def loss(tr):
        model = combine(tr, static)
        out, _ = model(wav, sequence_lengths=[400, 300])
        return jnp.sum(out ** 2)

    val, grads = jax.value_and_grad(loss)(trainable)
    assert np.isfinite(float(val))
    assert len(jax.tree_util.tree_leaves(grads)) == 2 * 2 * 2
    # adapter params are a tiny fraction of the model
    total = sum(np.asarray(l).size for l in jax.tree_util.tree_leaves(
        partition(m)[1]) if hasattr(l, 'size'))
    assert n_trainable < total * 0.2


def test_trainer_trains_only_adapters(tmp_path):
    # end-to-end: the Trainer's fused step must update A/B only; the
    # frozen base survives training AND checkpoint round-trip
    from padertorch_tpu.train import Trainer

    class M(pt.Model):
        def __init__(self):
            self.lin = nn.Linear(8, 8)
            self.head = nn.Linear(8, 2)

        def forward(self, batch):
            return self.head(jax.nn.relu(self.lin(batch['x'])))

        def review(self, batch, outputs):
            return {'loss': jnp.mean((outputs - batch['y']) ** 2)}

    ptrandom.seed(5)
    m = M().eval()
    apply_lora(m, rank=2)
    mark_only_lora_trainable(m)
    base_before = np.asarray(m.lin.weight).copy()
    b_before = np.asarray(m.lin.lora_b).copy()

    rng = np.random.RandomState(0)
    data = [{'x': rng.randn(4, 8).astype('f'),
             'y': rng.randn(4, 2).astype('f')} for _ in range(8)]

    def make_trainer(model):
        return Trainer(
            model=model, storage_dir=str(tmp_path),
            optimizer=pt.SGD(lr=0.1), stop_trigger=(1, 'epoch'),
            checkpoint_trigger=(1, 'epoch'),
            summary_trigger=(1, 'epoch'))

    trainer = make_trainer(m)
    trainer.train(data, resume=False)

    trained = trainer.model
    np.testing.assert_array_equal(
        np.asarray(trained.lin.weight), base_before)  # frozen
    assert np.abs(np.asarray(trained.lin.lora_b) - b_before).max() > 0

    # checkpoint restores both the frozen base and the adapters
    ptrandom.seed(6)  # different init — restore must overwrite it
    m2 = M().eval()
    apply_lora(m2, rank=2)
    mark_only_lora_trainable(m2)
    trainer2 = make_trainer(m2)
    trainer2.load_checkpoint()
    np.testing.assert_array_equal(
        np.asarray(trainer2.model.lin.weight), base_before)
    np.testing.assert_array_equal(
        np.asarray(trainer2.model.lin.lora_b),
        np.asarray(trained.lin.lora_b))
