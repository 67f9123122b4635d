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


def _kernel(x_ref, wq_ref, scale_ref, *rest, with_bias):
    # wq tile: (K, block_n) int8 in VMEM; convert is VPU work on the
    # tile only — the full dequantized weight never exists anywhere.
    bias_ref, out_ref = rest if with_bias else (None, rest[0])
    w = wq_ref[:].astype(x_ref.dtype)
    acc = jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)
    acc = acc * scale_ref[:]
    if with_bias:
        # bias fused here: a separate jnp add after a pallas_call is
        # its own HBM-touching op (XLA cannot fuse across the kernel
        # boundary) — measurable at decode batch sizes where every
        # extra op on the ~7-linears-per-layer step path costs dispatch
        acc = acc + bias_ref[:]
    out_ref[:] = acc.astype(out_ref.dtype)


def _pick_block_n(n):
    for cand in (512, 256, 128):
        if n % cand == 0:
            return cand
    return n  # n < 128 (already lane-padded by the wrapper)


@functools.partial(jax.jit, static_argnames=('interpret',))
def _int8_matmul_2d(x, w_q, scale, bias=None, *, interpret=False):
    m, k = x.shape
    _, n = w_q.shape
    block_n = _pick_block_n(n)
    grid = (n // block_n,)
    with_bias = bias is not None
    nblock_spec = pl.BlockSpec((1, block_n), lambda j: (0, j),
                               memory_space=pltpu.VMEM)
    in_specs = [
        # constant index map: x is fetched into VMEM once and
        # stays resident across the N-block grid
        pl.BlockSpec((m, k), lambda j: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((k, block_n), lambda j: (0, j),
                     memory_space=pltpu.VMEM),
        nblock_spec,
    ]
    args = [x, w_q, scale]
    if with_bias:
        in_specs.append(nblock_spec)
        args.append(bias)
    out = pl.pallas_call(
        functools.partial(_kernel, with_bias=with_bias),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((m, block_n), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*args)
    return out


def _round_up(v, mult):
    return -(-v // mult) * mult


def int8_matmul(x, w_q, scale, bias=None, *, out_features=None,
                k_logical=None, interpret=False):
    """``x @ (w_q * scale) [+ bias]`` with the weight read from HBM as
    int8 and the dequantize + scale + bias fused into the kernel.

    Args:
        x: (..., K) float32/bfloat16 activations.
        w_q: (K, N) int8 weights.  Pass K/N already padded to 128-lane
            multiples (e.g. pre-padded at quantization time, see
            ``QuantizedLinear``) to avoid two pad ops per call.
        scale: (N,) float32 per-output-channel symmetric scales.
        bias: optional float32 bias, added inside the kernel; length
            ``out_features`` (logical) or ``N`` — shorter biases are
            zero-padded to the padded width.
        out_features: slice the output back to this many columns when
            the weight was pre-padded (defaults to N).
        k_logical: declare that ``w_q``'s K rows beyond this count are
            zero padding (``QuantizedLinear`` pre-padding); x inputs
            with K == ``k_logical`` are then zero-padded to match.
            Without it, any x-vs-w_q K mismatch raises — silently
            zero-padding a genuinely mismatched x would drop the
            weight's real rows and return garbage.
        interpret: run the Pallas interpreter (CPU tests).

    Returns:
        (..., out_features) array in ``x.dtype``.

    The wrapper zero-pads K to a lane multiple (zero weight columns
    contribute nothing) and N to a 128-lane multiple (padded outputs
    are sliced off).  The flattened batch M is passed through as-is —
    Mosaic sublane-pads partial tiles internally, so no explicit M pad
    op is emitted.
    """
    if w_q.dtype != jnp.int8:
        raise ValueError(f'w_q must be int8, got {w_q.dtype}')
    *lead, k = x.shape
    k_w, n = w_q.shape
    if k_w != k and not (k_w > k and k == k_logical):
        raise ValueError(
            f'contraction mismatch: x K={k}, w_q K={k_w}'
            + ('' if k_logical is None
               else f' (declared k_logical={k_logical})'))
    m = 1
    for d in lead:
        m *= d
    x2 = x.reshape(m, k)
    if k_w > k:
        # declared pre-padded weight rows (all zeros): pad x to match
        x2 = jnp.pad(x2, ((0, 0), (0, k_w - k)))
        k = k_w

    # K is x's lane dim and w_q's sublane dim (int8 tile: 32 sublanes)
    k_pad = _round_up(k, 128)
    n_pad = _round_up(n, 128)
    if k_pad != k:
        x2 = jnp.pad(x2, ((0, 0), (0, k_pad - k)))
    if k_pad != k or n_pad != n:
        w_q = jnp.pad(w_q, ((0, k_pad - k), (0, n_pad - n)))
    scale2 = scale.astype(jnp.float32).reshape(1, n)
    if n_pad != n:
        scale2 = jnp.pad(scale2, ((0, 0), (0, n_pad - n)))
    # bias may be logical-width (out_features) while w_q/scale are
    # pre-padded — pad it to the kernel width, but ONLY from the two
    # declared widths; any other length is a caller bug (silently
    # zero-padding a mismatched bias would return garbage, same
    # argument as k_logical above)
    bias2 = None if bias is None else \
        bias.astype(jnp.float32).reshape(1, -1)
    if bias2 is not None and bias2.shape[1] != n_pad:
        legal = {n} | ({out_features} if out_features is not None
                       else set())
        if bias2.shape[1] not in legal:
            raise ValueError(
                f'bias length {bias2.shape[1]} matches neither N={n} '
                f'nor out_features={out_features}')
        bias2 = jnp.pad(bias2, ((0, 0), (0, n_pad - bias2.shape[1])))

    out = _int8_matmul_2d(x2, w_q, scale2, bias2, interpret=interpret)
    n_out = n if out_features is None else out_features
    return out[:, :n_out].reshape(*lead, n_out)
