"""Weight-only int8 quantization: accuracy bounds, tree walking, and
composition with KV-cache generation and StableHLO export."""
import numpy as np

import jax
import jax.numpy as jnp

import padertorch_tpu as pt
from padertorch_tpu import nn
from padertorch_tpu import random as ptrandom
from padertorch_tpu.quantize import (
    QuantizedLinear, quantization_error, quantize_module)


def test_quantized_linear_accuracy():
    ptrandom.seed(0)
    lin = nn.Linear(128, 64).eval()
    q = QuantizedLinear.from_linear(lin)
    assert q.weight_q.dtype == jnp.int8
    assert q.weight_q.shape == (128, 64)
    x = jnp.asarray(
        np.random.RandomState(0).randn(8, 128).astype('float32'))
    a, b = np.asarray(lin(x)), np.asarray(q(x))
    # per-channel symmetric int8: ~1% of the dynamic range
    assert np.abs(a - b).max() < 0.02 * np.abs(a).max()


def test_quantize_module_walks_lists_and_skips_small():
    ptrandom.seed(1)

    class M(pt.Module):
        def __init__(self):
            self.big = nn.Linear(64, 64)
            self.small = nn.Linear(4, 4)       # below min_params
            self.layers = [nn.Linear(64, 32), nn.Linear(64, 32)]

        def forward(self, x):
            return self.big(x)

    m = M().eval()
    n = quantize_module(m, min_params=256)
    assert n == 3
    assert isinstance(m.big, QuantizedLinear)
    assert isinstance(m.small, nn.Linear)
    assert all(isinstance(l, QuantizedLinear) for l in m.layers)


def _all_weights(mod):
    out = []

    def walk(m):
        for v in vars(m).values():
            if hasattr(v, 'nbytes'):
                out.append(v)
            elif isinstance(v, pt.Module):
                walk(v)
            elif isinstance(v, (list, tuple)):
                for i in v:
                    if isinstance(i, pt.Module):
                        walk(i)
                    elif hasattr(i, 'nbytes'):
                        out.append(i)
            elif isinstance(v, dict):
                for i in v.values():
                    if isinstance(i, pt.Module):
                        walk(i)
    walk(mod)
    return out


def test_param_bytes_shrink():
    ptrandom.seed(2)
    from padertorch_tpu.contrib.mk.modules.transformer import (
        TransformerDecoder)
    dec = TransformerDecoder(d_model=32, num_layers=2, num_heads=4).eval()
    before = sum(np.asarray(p).nbytes for p in _all_weights(dec))
    quantize_module(dec)
    after = sum(np.asarray(p).nbytes for p in _all_weights(dec))
    assert after < before * 0.4  # ~4x on the Linear weights


def test_quantized_generation_and_export():
    from padertorch_tpu.contrib.mk.modules.transformer import (
        TransformerDecoder, autoregressive_generate)
    from padertorch_tpu.serve import export_generate, load_exported
    ptrandom.seed(3)
    dec = TransformerDecoder(
        d_model=32, num_layers=2, num_heads=4, use_rope=True).eval()
    emb_w = jnp.asarray(
        np.random.default_rng(4).normal(size=(11, 32)).astype('f'))
    head = nn.Linear(32, 11)
    memory = np.random.default_rng(5).normal(
        size=(2, 5, 32)).astype('float32')

    ref_toks, _ = autoregressive_generate(
        dec, jnp.asarray(memory), embed=lambda t: emb_w[t],
        logits_head=head, bos_id=0, max_len=6, eos_id=1)

    n = quantize_module(dec, min_params=256)
    assert n >= 2 * 4  # at least the attention projections per layer
    q_toks, _ = autoregressive_generate(
        dec, jnp.asarray(memory), embed=lambda t: emb_w[t],
        logits_head=head, bos_id=0, max_len=6, eos_id=1)
    assert q_toks.shape == ref_toks.shape

    # export the quantized decoder's generation loop and round-trip
    blob = export_generate(
        dec, memory, embed=lambda t: emb_w[t], logits_head=head,
        bos_id=0, max_len=6, eos_id=1)
    fn = load_exported(blob)
    exp_toks, _ = fn(memory)
    np.testing.assert_array_equal(np.asarray(exp_toks),
                                  np.asarray(q_toks))


def test_quantization_error_helper():
    ptrandom.seed(4)

    class M(pt.Module):
        def __init__(self):
            self.lin = nn.Linear(64, 32)

        def forward(self, x):
            return self.lin(x)

    import copy
    m = M().eval()
    q = copy.deepcopy(m)
    quantize_module(q)
    x = jnp.asarray(
        np.random.RandomState(1).randn(4, 64).astype('float32'))
    err = quantization_error(m, q, x)
    assert 0 <= err < 0.02


def test_prepadded_biased_linear_kernel_path():
    """Regression: ``from_linear`` pre-pads weight_q/scale to 128-lane
    tiles but keeps the bias logical-width; the fused kernel path must
    pad the bias independently instead of crashing on the reshape
    (Linear(128, 120) -> weight padded to (128, 128), bias (120,))."""
    ptrandom.seed(3)
    lin = nn.Linear(128, 120).eval()
    q = QuantizedLinear.from_linear(lin)
    assert q.weight_q.shape == (128, 128)     # pre-padded
    assert q.bias is not None and q.bias.shape == (120,)
    x = jnp.asarray(
        np.random.RandomState(1).randn(4, 128).astype('float32'))
    want = np.asarray(lin(x))
    q.use_kernel = 'interpret'
    got = np.asarray(q(x))
    assert got.shape == (4, 120)
    assert np.abs(got - want).max() < 0.02 * np.abs(want).max()


def test_int8_matmul_rejects_undeclared_k_mismatch():
    """A genuinely mismatched x-vs-w_q K must raise (silently
    zero-padding would drop the weight's real rows), while a declared
    pre-pad (``k_logical``) is accepted."""
    import pytest
    from padertorch_tpu.ops.pallas.int8_matmul import int8_matmul

    w_q = jnp.zeros((256, 128), jnp.int8)
    scale = jnp.ones((128,), jnp.float32)
    x = jnp.zeros((2, 200), jnp.float32)
    with pytest.raises(ValueError, match='contraction mismatch'):
        int8_matmul(x, w_q, scale, interpret=True)
    # declared: x K must equal k_logical exactly
    out = int8_matmul(x, w_q, scale, k_logical=200, interpret=True)
    assert out.shape == (2, 128)
    with pytest.raises(ValueError, match='contraction mismatch'):
        int8_matmul(jnp.zeros((2, 190), jnp.float32), w_q, scale,
                    k_logical=200, interpret=True)
