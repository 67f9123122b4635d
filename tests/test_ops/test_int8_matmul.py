"""Fused int8 dequant-matmul kernel vs the jnp dequantize oracle
(Pallas interpreter on CPU)."""
import numpy as np
import pytest

import jax.numpy as jnp

from padertorch_tpu.ops.pallas.int8_matmul import int8_matmul


def _case(m, k, n, seed, dtype):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(m, k), dtype)
    w_q = jnp.asarray(rng.randint(-127, 128, size=(k, n)), jnp.int8)
    scale = jnp.asarray(np.abs(rng.randn(n)).astype('float32') * 0.01)
    return x, w_q, scale


@pytest.mark.parametrize('m,k,n', [
    (1, 128, 256),      # decode GEMV, aligned
    (8, 512, 512),      # small batch
    (3, 100, 77),       # every dim unaligned -> wrapper padding
    (16, 384, 1280),    # block_n=256 path
])
@pytest.mark.parametrize('dtype', [jnp.float32, jnp.bfloat16])
def test_matches_dequant_oracle(m, k, n, dtype):
    x, w_q, scale = _case(m, k, n, seed=m + k + n, dtype=dtype)
    got = int8_matmul(x, w_q, scale, interpret=True)
    want = x @ (w_q.astype(x.dtype) * scale.astype(x.dtype))
    assert got.shape == (m, n)
    assert got.dtype == x.dtype
    # primary oracle: the exact float64 integer math. The kernel is
    # *tighter* than the jnp dequant path for bf16 inputs (int8 ->
    # bf16 conversion is exact at |w| <= 127 and the accumulator is
    # f32 with a post-dot f32 scale, while the jnp path rounds every
    # dequantized weight to bf16 before the dot: measured ~4e-3 vs
    # ~6e-2 rel for K=512 bf16), so comparing against jnp would have
    # to use the jnp path's LOOSER error.  Note this environment's
    # XLA CPU backend also runs f32 matmuls on a reduced-precision
    # fastpath (a plain jnp f32 512-dot is ~2e-3 off float64).
    g = np.asarray(got, 'float32')
    exact = (np.asarray(x, 'float64')
             @ np.asarray(w_q, 'float64')) * np.asarray(scale, 'float64')
    rel_exact = np.abs(g - exact) / (1.0 + np.abs(exact))
    assert rel_exact.max() < 1e-2, rel_exact.max()
    # the jnp dequant path agrees within ITS bf16 weight-rounding error
    w = np.asarray(want, 'float32')
    rel = np.abs(g - w) / (1.0 + np.abs(w))
    assert rel.max() < 0.15, rel.max()


def test_leading_dims_flatten():
    x, w_q, scale = _case(6, 64, 128, seed=0, dtype=jnp.float32)
    x3 = x.reshape(2, 3, 64)
    got = int8_matmul(x3, w_q, scale, interpret=True)
    want = int8_matmul(x, w_q, scale, interpret=True).reshape(2, 3, 128)
    assert got.shape == (2, 3, 128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want))


def test_rejects_bad_inputs():
    x, w_q, scale = _case(2, 32, 64, seed=1, dtype=jnp.float32)
    with pytest.raises(ValueError, match='int8'):
        int8_matmul(x, w_q.astype(jnp.int32), scale, interpret=True)
    with pytest.raises(ValueError, match='contraction'):
        # x wider than the weight is a real mismatch
        int8_matmul(jnp.concatenate([x, x], axis=-1), w_q, scale,
                    interpret=True)
    with pytest.raises(ValueError, match='contraction'):
        # x narrower is ALSO a mismatch unless the caller declares the
        # weight rows beyond k_logical as pre-padding (zero rows) —
        # silently padding would drop real weight rows
        int8_matmul(x[:, :16], jnp.pad(w_q[:16], ((0, 16), (0, 0))),
                    scale, interpret=True)
    np.testing.assert_allclose(
        np.asarray(int8_matmul(x[:, :16], w_q[:16], scale,
                               interpret=True)),
        np.asarray(int8_matmul(
            x[:, :16],
            jnp.pad(w_q[:16], ((0, 16), (0, 0))), scale,
            k_logical=16, interpret=True)),
        rtol=1e-5)


def test_quantized_linear_kernel_path():
    """QuantizedLinear on the kernel path == its XLA dequant path."""
    import padertorch_tpu as pt
    from padertorch_tpu import nn
    from padertorch_tpu import random as ptrandom
    from padertorch_tpu.quantize import QuantizedLinear

    ptrandom.seed(0)
    lin = nn.Linear(96, 130).eval()   # unaligned out dim
    q = QuantizedLinear.from_linear(lin)
    x = jnp.asarray(
        np.random.RandomState(2).randn(5, 96).astype('float32'))
    q.use_kernel = False
    want = np.asarray(q(x))
    q.use_kernel = 'interpret'
    got = np.asarray(q(x))
    rel = np.abs(got - want) / (1.0 + np.abs(want))
    assert rel.max() < 1e-2, rel.max()  # backend matmul precision
