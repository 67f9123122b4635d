"""Carried-state streaming conformer: chunked == one-shot causal.

The serving contract: feeding chunks through ``stream_step`` with the
carried state (attention KV cache + depthwise-conv left context) must
reproduce the causal one-shot ``forward`` exactly — not just the prefix
property (which recomputes the prefix), but O(chunk) incremental
compute.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from padertorch_tpu import random as ptrandom
from padertorch_tpu.modules.conformer import (
    ConformerBlock, ConformerConvModule, ConformerEncoder,
)


def _rand(*shape, seed=0):
    return jnp.asarray(
        np.random.RandomState(seed).randn(*shape).astype('float32'))


@pytest.mark.parametrize('norm', ['batch_norm', 'layer_norm'])
def test_conv_module_stream_equals_causal_forward(norm):
    ptrandom.seed(0)
    conv = ConformerConvModule(
        16, kernel_size=5, norm=norm, causal=True).eval()
    x = _rand(2, 20, 16)
    full = np.asarray(conv(x))
    state = conv.init_stream_state(2)
    outs = []
    for start in range(0, 20, 4):
        y, state = conv.stream_step(x[:, start:start + 4], state)
        outs.append(np.asarray(y))
    np.testing.assert_allclose(
        np.concatenate(outs, axis=1), full, atol=1e-5)


def test_block_stream_equals_causal_forward():
    ptrandom.seed(0)
    block = ConformerBlock(
        16, num_heads=2, kernel_size=5, causal=True).eval()
    x = _rand(2, 24, 16, seed=1)
    full = np.asarray(block(x))
    state = block.init_stream_state(2, max_len=24)
    outs = []
    index = 0
    for size in (8, 4, 12):  # uneven chunking
        y, state = block.stream_step(
            x[:, index:index + size], state, index)
        outs.append(np.asarray(y))
        index += size
    np.testing.assert_allclose(
        np.concatenate(outs, axis=1), full, atol=1e-5)


def test_encoder_stream_equals_causal_forward_and_jits():
    ptrandom.seed(0)
    enc = ConformerEncoder(
        d_model=16, num_layers=2, num_heads=2, kernel_size=5,
        causal=True, input_size=8).eval()
    x = _rand(2, 16, 8, seed=2)
    full = np.asarray(enc(x))

    @jax.jit
    def step(chunk, state, index):
        return enc.stream_step(chunk, state, index)

    state = enc.init_stream_state(2, max_len=16)
    outs = []
    for start in range(0, 16, 4):
        y, state = step(x[:, start:start + 4], state, start)
        outs.append(np.asarray(y))
    np.testing.assert_allclose(
        np.concatenate(outs, axis=1), full, atol=1e-5)


def test_stream_requires_causal():
    ptrandom.seed(0)
    enc = ConformerEncoder(
        d_model=16, num_layers=1, num_heads=2, kernel_size=5,
        causal=False).eval()
    with pytest.raises(AssertionError):
        enc.init_stream_state(1, max_len=8)
