"""Dual-path transformer (SepFormer-style) separator tests."""
import numpy as np
import jax
import jax.numpy as jnp

from padertorch_tpu import random as ptrandom
from padertorch_tpu.modules.dual_path_transformer import (
    DualPathTransformer,
)


def make_dpt(**kw):
    ptrandom.seed(0)
    kwargs = dict(input_size=16, window_length=10, hop_size=5,
                  num_blocks=2, num_layers_intra=1, num_layers_inter=1,
                  num_heads=4)
    kwargs.update(kw)
    return DualPathTransformer(**kwargs)


def test_shapes_and_jit():
    dpt = make_dpt().eval()
    x = jnp.asarray(np.random.RandomState(0).randn(2, 30, 16),
                    jnp.float32)
    out = dpt(x)
    assert out.shape == (2, 30, 16)
    jit_out = jax.jit(lambda m, a: m(a))(dpt, x)
    np.testing.assert_allclose(np.asarray(jit_out), np.asarray(out),
                               atol=1e-5)


def test_sequence_lengths_mask_padded_chunks():
    """Trailing all-padding chunks must not change the valid prefix."""
    dpt = make_dpt().eval()
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 60, 16), jnp.float32)
    # same data, longer zero tail
    x_long = jnp.pad(x, ((0, 0), (0, 40), (0, 0)))
    out = dpt(x, sequence_lengths=jnp.array([60]))
    out_long = dpt(x_long, sequence_lengths=jnp.array([60]))
    np.testing.assert_allclose(
        np.asarray(out_long[:, :60]), np.asarray(out), atol=1e-4)


def test_gradients_flow():
    dpt = make_dpt()
    x = jnp.asarray(np.random.RandomState(2).randn(2, 30, 16),
                    jnp.float32)

    def loss(m):
        return jnp.sum(m(x) ** 2)

    g = jax.grad(loss)(dpt)
    leaves = jax.tree_util.tree_leaves(g)
    assert leaves and all(np.all(np.isfinite(l)) for l in leaves)
    assert any(float(jnp.max(jnp.abs(l))) > 0 for l in leaves)


def test_flash_backend_matches_dense():
    from padertorch_tpu.contrib.mk.modules.transformer import (
        set_attention_backend)
    dpt = make_dpt(num_heads=2).eval()
    x = jnp.asarray(np.random.RandomState(3).randn(2, 50, 16),
                    jnp.float32)
    ref = dpt(x, sequence_lengths=jnp.array([50, 35]))
    set_attention_backend(dpt, use_flash=True)
    out = dpt(x, sequence_lengths=jnp.array([50, 35]))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-5)


def test_tasnet_sepformer_variant():
    from padertorch_tpu.models.tasnet import TasNet, TasEncoder
    ptrandom.seed(0)
    model = TasNet.new({
        'encoder': {'factory': TasEncoder, 'feature_size': 32},
        'separator': {
            'factory':
                'padertorch_tpu.modules.dual_path_transformer'
                '.DualPathTransformer',
            'input_size': 16, 'window_length': 10, 'hop_size': 5,
            'num_blocks': 1, 'num_layers_intra': 1,
            'num_layers_inter': 1, 'num_heads': 2,
        },
    }).eval()
    rng = np.random.RandomState(0)
    b = {
        'y': jnp.asarray(rng.randn(2, 800).astype('float32')),
        's': jnp.asarray(rng.randn(2, 2, 800).astype('float32')),
        'num_samples': jnp.asarray([800, 700]),
    }
    out = model(b)
    assert out['out'].shape == (2, 2, 800)
    review = model.review(b, out)
    for v in review['losses'].values():
        assert np.isfinite(float(v)), review['losses']


def test_tasnet_sepformer_config_defaults():
    from padertorch_tpu.models.tasnet import TasNet
    config = TasNet.get_config({
        'separator': {
            'factory':
                'padertorch_tpu.modules.dual_path_transformer'
                '.DualPathTransformer',
        },
    })
    sep = config['separator']
    assert sep['input_size'] == 128 and sep['num_blocks'] == 4
    assert sep['num_layers_intra'] == 2 and sep['num_heads'] == 8
