"""Fused int8-weight matmul (dequantize-in-VMEM) as a Pallas TPU kernel.

Purpose: weight-only int8 serving (``padertorch_tpu/quantize.py``)
shrinks resident weights 4x, but the XLA path dequantizes with a
convert+multiply over the full (K, N) weight *before* the dot — at
decode batch sizes the materialized bf16/f32 weight puts the HBM
traffic right back (measured on a 403 MB d=1024 decoder: int8 via XLA
is only 1.15x bf16 at B=1; doc/serving.md "Weight-only int8").

This kernel makes the 4x weight-read saving real:

- HBM only ever sees the int8 weights and the (1, N) float32 scales;
  the int8 -> input-dtype convert happens on the VPU *in VMEM*, on one
  (K, block_n) tile at a time, overlapped with the MXU dot of the
  previous tile by the Pallas pipeline.
- symmetric per-output-channel scales commute with the contraction:
  ``(x @ (w_q * s)) == (x @ w_q) * s`` — so the scale is applied to the
  (M, block_n) *output* tile (M*N multiplies) instead of the (K, N)
  weight (K*N multiplies). XLA cannot do this because the scale lives
  inside the dot operand it fuses.
- decode GEMVs (M = batch of 1..32 rows) are exactly the
  bandwidth-bound case: the kernel reads K*N bytes instead of 2*K*N
  (bf16) per step.

Serving/eval only, like ``QuantizedLinear`` (int8 leaves carry no
gradient); the wrapper raises under differentiation.

``interpret=True`` runs the same kernel on CPU for tests.
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ['int8_matmul']


def _kernel(x_ref, wq_ref, scale_ref, out_ref):
    # wq tile: (K, block_n) int8 in VMEM; convert is VPU work on the
    # tile only — the full dequantized weight never exists anywhere.
    w = wq_ref[:].astype(x_ref.dtype)
    acc = jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)
    out_ref[:] = (acc * scale_ref[:]).astype(out_ref.dtype)


def _pick_block_n(n):
    for cand in (512, 256, 128):
        if n % cand == 0:
            return cand
    return n  # n < 128 (already lane-padded by the wrapper)


@functools.partial(jax.jit, static_argnames=('interpret',))
def _int8_matmul_2d(x, w_q, scale, *, interpret=False):
    m, k = x.shape
    _, n = w_q.shape
    block_n = _pick_block_n(n)
    grid = (n // block_n,)
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        grid=grid,
        in_specs=[
            # constant index map: x is fetched into VMEM once and
            # stays resident across the N-block grid
            pl.BlockSpec((m, k), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, block_n), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, block_n), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, w_q, scale)
    return out


def _round_up(v, mult):
    return -(-v // mult) * mult


def int8_matmul(x, w_q, scale, *, interpret=False):
    """``x @ (w_q * scale)`` with the weight read from HBM as int8.

    Args:
        x: (..., K) float32/bfloat16 activations.
        w_q: (K, N) int8 weights.
        scale: (N,) float32 per-output-channel symmetric scales.
        interpret: run the Pallas interpreter (CPU tests).

    Returns:
        (..., N) array in ``x.dtype``.

    The wrapper zero-pads K to a lane multiple (zero weight columns
    contribute nothing), N to a 128-lane multiple (padded outputs are
    sliced off) and the flattened batch M to the sublane tile of
    ``x.dtype``.
    """
    if w_q.dtype != jnp.int8:
        raise ValueError(f'w_q must be int8, got {w_q.dtype}')
    *lead, k = x.shape
    k_w, n = w_q.shape
    if k_w != k:
        raise ValueError(f'contraction mismatch: x K={k}, w_q K={k_w}')
    m = 1
    for d in lead:
        m *= d
    x2 = x.reshape(m, k)

    sublane = 8 if x.dtype == jnp.float32 else 16
    m_pad = _round_up(max(m, 1), sublane)
    # K is x's lane dim and w_q's sublane dim (int8 tile: 32 sublanes)
    k_pad = _round_up(k, 128)
    n_pad = _round_up(n, 128)
    if m_pad != m or k_pad != k:
        x2 = jnp.pad(x2, ((0, m_pad - m), (0, k_pad - k)))
    if k_pad != k or n_pad != n:
        w_q = jnp.pad(w_q, ((0, k_pad - k), (0, n_pad - n)))
    scale2 = scale.astype(jnp.float32).reshape(1, n)
    if n_pad != n:
        scale2 = jnp.pad(scale2, ((0, 0), (0, n_pad - n)))

    out = _int8_matmul_2d(x2, w_q, scale2, interpret=interpret)
    return out[:m, :n].reshape(*lead, n)
