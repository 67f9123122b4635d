"""Conformer encoder tests: shapes, padding invariance, masked batch
norm, causal/streaming prefix property, flash backend equality."""
import numpy as np
import jax
import jax.numpy as jnp

from padertorch_tpu import random as ptrandom
from padertorch_tpu.modules.conformer import (
    ConformerEncoder, ConformerConvModule,
)


def make_encoder(**kw):
    ptrandom.seed(0)
    kwargs = dict(d_model=32, num_layers=2, num_heads=4, kernel_size=7,
                  input_size=16)
    kwargs.update(kw)
    return ConformerEncoder(**kwargs)


def test_shapes_and_jit():
    enc = make_encoder().eval()
    x = jnp.asarray(np.random.RandomState(0).randn(2, 20, 16),
                    jnp.float32)
    out = enc(x, seq_len=jnp.array([20, 15]))
    assert out.shape == (2, 20, 32)
    jit_out = jax.jit(lambda m, a, l: m(a, seq_len=l))(
        enc, x, jnp.array([20, 15]))
    np.testing.assert_allclose(np.asarray(jit_out), np.asarray(out),
                               atol=1e-5)


def test_padding_invariance_eval():
    """Extending the zero tail of a padded example never changes the
    valid prefix (conv inputs are masked, attention masks keys)."""
    enc = make_encoder().eval()
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 18, 16), jnp.float32)
    x_long = jnp.pad(x, ((0, 0), (0, 13), (0, 0)))
    out = enc(x, seq_len=jnp.array([18]))
    out_long = enc(x_long, seq_len=jnp.array([18]))
    np.testing.assert_allclose(np.asarray(out_long[:, :18]),
                               np.asarray(out), atol=1e-5)


def test_masked_batch_norm_ignores_padding_in_train():
    """Train-mode batch-norm statistics come from valid frames only:
    the same valid frames padded differently give the same outputs."""
    rng = np.random.RandomState(2)
    data = rng.randn(2, 12, 16).astype('float32')
    lens = jnp.array([12, 9])

    enc_a = make_encoder(num_layers=1).train()
    out_a = enc_a(jnp.asarray(data), seq_len=lens)
    enc_b = make_encoder(num_layers=1).train()
    padded = np.concatenate(
        [data, rng.randn(2, 7, 16).astype('float32')], axis=1)
    # frames beyond the length are garbage, not zeros: the mask must
    # remove them from the statistics entirely
    out_b = enc_b(jnp.asarray(padded), seq_len=lens)
    np.testing.assert_allclose(np.asarray(out_b[0, :12]),
                               np.asarray(out_a[0, :12]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_b[1, :9]),
                               np.asarray(out_a[1, :9]), atol=1e-4)


def test_causal_prefix_property():
    """causal=True (causal attention + left-padded conv): outputs at
    frame t never depend on frames > t."""
    enc = make_encoder(causal=True, conv_norm='layer_norm').eval()
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 20, 16), jnp.float32)
    full = enc(x)
    prefix = enc(x[:, :12])
    np.testing.assert_allclose(np.asarray(full[:, :12]),
                               np.asarray(prefix), atol=1e-4)


def test_gradients_flow():
    enc = make_encoder()
    x = jnp.asarray(np.random.RandomState(4).randn(2, 16, 16),
                    jnp.float32)

    def loss(m):
        return jnp.sum(m(x, seq_len=jnp.array([16, 10])) ** 2)

    g = jax.grad(loss)(enc)
    leaves = jax.tree_util.tree_leaves(g)
    assert leaves and all(np.all(np.isfinite(l)) for l in leaves)
    assert any(float(jnp.max(jnp.abs(l))) > 0 for l in leaves)


def test_flash_backend_matches_dense():
    from padertorch_tpu.contrib.mk.modules.transformer import (
        set_attention_backend)
    enc = make_encoder(num_heads=2).eval()
    x = jnp.asarray(np.random.RandomState(5).randn(2, 24, 16),
                    jnp.float32)
    ref = enc(x, seq_len=jnp.array([24, 17]))
    set_attention_backend(enc, use_flash=True)
    out = enc(x, seq_len=jnp.array([24, 17]))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-5)


def test_conv_module_glu_and_depthwise_oracle():
    """The conv module equals a numpy re-execution of
    LN -> pointwise(2x) -> GLU -> depthwise -> LN -> SiLU -> pointwise."""
    ptrandom.seed(0)
    m = ConformerConvModule(
        8, kernel_size=3, norm='layer_norm').eval()
    rng = np.random.RandomState(6)
    x = rng.randn(1, 10, 8).astype('float32')
    out = np.asarray(m(jnp.asarray(x)))

    def ln(a, w, b):
        mu = a.mean(-1, keepdims=True)
        var = a.var(-1, keepdims=True)
        return (a - mu) / np.sqrt(var + 1e-5) * w + b

    h = ln(x, np.asarray(m.norm_in.weight), np.asarray(m.norm_in.bias))
    w1 = np.asarray(m.pointwise1.weight)[:, :, 0]  # (16, 8)
    b1 = np.asarray(m.pointwise1.bias)
    h = h @ w1.T + b1
    a, b = h[..., :8], h[..., 8:]
    h = a / (1 + np.exp(-b)) * 0 + a * (1 / (1 + np.exp(-b)))
    # depthwise, 'same' padding
    wd = np.asarray(m.depthwise.weight)[:, 0, :]  # (8, 3)
    bd = np.asarray(m.depthwise.bias)
    hp = np.pad(h, ((0, 0), (1, 1), (0, 0)))
    conv = np.stack([
        sum(hp[:, t + k, :] * wd[:, k] for k in range(3))
        for t in range(10)
    ], axis=1) + bd
    h = ln(conv, np.asarray(m.norm_conv.weight),
           np.asarray(m.norm_conv.bias))
    h = h / (1 + np.exp(-h))
    w2 = np.asarray(m.pointwise2.weight)[:, :, 0]
    b2 = np.asarray(m.pointwise2.bias)
    h = h @ w2.T + b2
    np.testing.assert_allclose(out, h, atol=1e-5)
