"""Fused (flash) multi-head attention as Pallas TPU kernels.

Purpose: the transformer stacks (``contrib/mk/modules/transformer.py``,
wav2vec2/WavLM, je transformer) materialize the (B, H, Tq, Tk) logits
tensor in HBM; at speech sequence lengths (Tk in the thousands) that is
the dominant HBM traffic of the encoder.  This kernel streams K/V blocks
through VMEM with the online-softmax recurrence (Dao et al., 2022,
"FlashAttention") so only the (B, H, Tq, D) output and a (B, H, Tq)
log-sum-exp vector ever touch HBM, for the forward AND the backward
pass (the backward recomputes probabilities blockwise from the stored
LSE instead of reading stored weights).

Design (per the TPU kernel playbook):
- grid (B*H, T blocks): one (block_q, D) query tile per program; K/V for
  the (b, h) row live in VMEM and are consumed in (block_k, D) slices
  inside a ``fori_loop`` — all matmuls are MXU-shaped (128-lane last
  dim; D is zero-padded to a lane multiple by the wrapper).
- causal masking prunes the KV loop to the blocks at or below the
  diagonal (dynamic ``fori_loop`` bound), so causal attention does half
  the FLOPs instead of masking them away.
- sliding-window (``window=(left, right)``, Longformer-banded) masking
  prunes BOTH loop bounds, in the forward (KV blocks per query block)
  and the backward (query blocks per KV block): local attention costs
  O(T·W) compute instead of O(T^2) — a band an additive bias mask
  cannot prune.
- masking uses a finite ``-1e30`` fill plus an explicit zero of masked
  probabilities, so fully-masked rows (query padding) yield 0 output and
  0 gradients instead of NaNs.
- numerics: probabilities and accumulators are float32 regardless of the
  input dtype (bf16 inputs stay bf16 for the QK/PV matmul operands).

``interpret=True`` runs the same kernels on CPU for tests.
"""
import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ['flash_attention', 'should_use_flash']

_NEG = -1e30

# Measured flash-vs-XLA fwd+bwd crossover points on TPU v5e at speech
# encoder shapes (B=8, H=12, D=64, bf16), at the TUNED block sizes of
# ``_auto_blocks`` — see doc/performance.md "Fused attention" for the
# measurement table.  Below the threshold XLA's materializing-but-fused
# attention is faster (its big batched GEMMs beat the kernel's block
# loop when the logits tensor still fits caches comfortably); above it
# the O(T) HBM traffic + block pruning win (T=1024: ~1.8x in every
# mode, growing to 2.6-8.1x at T=4096; T=512: XLA wins at ~1.5x).
# The thresholds compare max(Tq, Tk).
_FLASH_MIN_T_CAUSAL = 1024
_FLASH_MIN_T_FULL = 1024
_FLASH_MIN_T_WINDOW = 1024

# The backward keeps full-row residents (q, do, dq at (T, d_p) plus
# lse/delta) in VMEM per (b, h) row — ~8*T*d_p bytes.  Under Mosaic's
# DEFAULT VMEM budget that made 384+-wide blocks fail to allocate at
# T=4096/d_p=128, so the kernel passes an explicit
# vmem_limit_bytes=128 MiB (the physical v5e/v5p VMEM) to every
# pallas_call; with it, 512-wide blocks compile and run through at
# least T*d_p == 4096*128 (measured) and arithmetically fit far
# beyond.  The conservative fallback below only kicks in past
# T*d_p == 8192*128, unverifiable on this session's relay (the remote
# compile helper 500s on ANY program that large, XLA path included).
_VMEM_LIMIT_BYTES = 128 * 1024 * 1024
_AUTO_BLOCK_VMEM_ROWS = 8192 * 128


def _auto_blocks(tq, tk, d_p, causal, window):
    """Tuned (block_q, block_k) for the measured v5e optimum.

    Sweep (fwd+bwd, at B=8/H=12/D=64 and B=4/H=16/D=128, bf16) over
    {128..512}^2 blocks: 512-wide blocks are 1.7-4.3x faster than the
    128x128 default tile — fewer grid steps amortize the per-block
    softmax bookkeeping (VPU) against bigger MXU matmuls.  Banded
    shapes favor a narrower 256 query block (the band prune has block
    granularity; a narrow query block tracks the band more tightly);
    full and causal attention take the full 512x512.
    """
    banded = window is not None and window != (None, None)
    if max(tq, tk) * d_p > _AUTO_BLOCK_VMEM_ROWS:
        bq, bk = 256, 256
    elif banded:
        # a narrower query block tracks the band more tightly (the
        # prune has block granularity): band 512 @ T=4096 measures
        # 11.2 ms at 256x512 vs 12.9 ms at 512x512
        bq, bk = 256, 512
    else:
        bq, bk = 512, 512
    # never tile wider than the (lane-padded) sequence itself
    return min(bq, _ceil_to(tq, 128)), min(bk, _ceil_to(tk, 128))


def should_use_flash(tq, tk=None, *, causal=False, window=None):
    """Dispatch heuristic: does the fused kernel beat XLA's dense path?

    Encodes the measured v5e crossover (fwd+bwd training step at the
    tuned ``_auto_blocks`` tiles; see doc/performance.md "Fused
    attention"): at T >= 1024 the kernel wins every mode (~1.8x,
    growing to 2.6x full / 5.2x causal / 8.1x banded at T=4096 since
    causal/banded *skip* above-diagonal/out-of-band KV blocks, which a
    dense mask cannot); at T <= 512 XLA's fused softmax over one big
    batched GEMM wins ~1.5x.  On non-TPU backends it always returns
    False (the Pallas interpreter is an emulation for tests, never a
    win).

    ``MultiHeadAttention(use_flash='auto')`` (the default) consults
    this per call; pass ``use_flash=True/False`` to force a backend.
    """
    if jax.default_backend() != 'tpu':
        return False
    t = max(tq, tk if tk is not None else tq)
    if window is not None and window != (None, None):
        return t >= _FLASH_MIN_T_WINDOW
    if causal:
        return t >= _FLASH_MIN_T_CAUSAL
    return t >= _FLASH_MIN_T_FULL


def _ceil_to(x, m):
    return -(-x // m) * m


def _mask(iq, j, block_q, block_k, kv_len, causal, window,
          dtype=jnp.float32):
    """(block_q, block_k) validity mask for query block iq / kv block j."""
    rows = jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 0) + iq * block_q
    cols = jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 1) + j * block_k
    valid = cols < kv_len
    if causal:
        valid = valid & (cols <= rows)
    left, right = window
    if left is not None:
        valid = valid & (rows - cols <= left)
    if right is not None:
        valid = valid & (cols - rows <= right)
    return valid


def _fwd_kernel(lens_ref, q_ref, k_ref, v_ref, o_ref, lse_ref, *,
                block_q, block_k, causal, window, scale):
    iq = pl.program_id(1)
    kv_len = lens_ref[pl.program_id(0)]
    q = q_ref[0]  # (block_q, D)
    d = q.shape[-1]
    nk_total = k_ref.shape[1] // block_k
    left, right = window
    if causal or right is not None:
        # blocks that intersect cols <= last row of this q block (+ right;
        # under causal the right reach is 0 whatever the window says)
        reach = 0 if causal else right
        nk = jnp.minimum(
            nk_total, pl.cdiv((iq + 1) * block_q + reach, block_k))
    else:
        nk = nk_total
    # also prune blocks entirely beyond kv_len
    nk = jnp.minimum(nk, pl.cdiv(kv_len, block_k))
    if left is not None:
        # first block that intersects cols >= first row - left
        j0 = jnp.maximum(0, (iq * block_q - left) // block_k)
    else:
        j0 = 0

    def body(j, carry):
        m, l, acc = carry
        kb = k_ref[0, pl.ds(j * block_k, block_k), :]
        vb = v_ref[0, pl.ds(j * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, kb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        valid = _mask(iq, j, block_q, block_k, kv_len, causal, window)
        s = jnp.where(valid, s, _NEG)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        p = jnp.where(valid, p, 0.0)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(vb.dtype), vb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return m_new, l, acc

    m0 = jnp.full((block_q, 1), _NEG, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    a0 = jnp.zeros((block_q, d), jnp.float32)
    m, l, acc = jax.lax.fori_loop(j0, nk, body, (m0, l0, a0))
    l_safe = jnp.maximum(l, 1e-30)
    o_ref[0] = (acc / l_safe).astype(o_ref.dtype)
    lse_ref[0] = m + jnp.log(l_safe)  # (block_q, 1)


def _dqkv_kernel(lens_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                 dq_ref, dk_ref, dv_ref, *, block_q, block_k, causal,
                 window, scale):
    """One fused backward kernel for dq, dk and dv.

    The textbook flash backward runs two kernels (a dq pass gridded
    over query blocks and a dk/dv pass gridded over KV blocks), which
    recomputes the (block_q, block_k) logits/probability tiles twice —
    9 tile matmuls per training step vs the naive path's 7, which is
    why a two-kernel version measures ~0.7x XLA's materializing
    attention on a v5e.  On TPU the Pallas grid is a *sequential* loop
    on one TensorCore, so dq can instead be accumulated across the KV
    grid: ``dq_ref``'s index map ignores the KV block index, Mosaic
    keeps the block resident in VMEM across the whole (b, h) row, we
    zero it at j == 0 and add each block's contribution.  Each
    (i, j) tile is then visited exactly once for the whole backward
    (7 matmuls total, same FLOPs as the naive path) while the
    HBM-traffic advantage remains.
    """
    j = pl.program_id(1)
    kv_len = lens_ref[pl.program_id(0)]
    kb = k_ref[0]  # (block_k, D)
    vb = v_ref[0]
    d = kb.shape[-1]
    nq_total = q_ref.shape[1] // block_q

    @pl.when(j == 0)
    def _init():
        dq_ref[0] = jnp.zeros_like(dq_ref[0])

    left, right = window
    i0 = (j * block_k) // block_q if causal else 0
    if right is not None:
        # rows below col_min - right never see this KV block
        i0 = jnp.maximum(i0, (j * block_k - right) // block_q)
    i0 = jnp.maximum(i0, 0)
    if left is not None:
        # rows above col_max + left never see this KV block
        nq_hi = jnp.minimum(
            nq_total, pl.cdiv((j + 1) * block_k + left, block_q))
    else:
        nq_hi = nq_total
    # KV blocks entirely beyond kv_len contribute nothing
    nq = jnp.where(j * block_k < kv_len, nq_hi, i0)

    def body(i, carry):
        dk, dv = carry
        qb = q_ref[0, pl.ds(i * block_q, block_q), :]
        dob = do_ref[0, pl.ds(i * block_q, block_q), :] \
            .astype(jnp.float32)
        lse = lse_ref[0, pl.ds(i * block_q, block_q), :]
        delta = delta_ref[0, pl.ds(i * block_q, block_q), :]
        s = jax.lax.dot_general(
            qb, kb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        valid = _mask(i, j, block_q, block_k, kv_len, causal, window)
        p = jnp.exp(jnp.where(valid, s, _NEG) - lse)
        p = jnp.where(valid, p, 0.0)
        dv = dv + jax.lax.dot_general(
            p, dob, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(
            dob, vb.astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        dk = dk + jax.lax.dot_general(
            ds, qb.astype(jnp.float32), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        iq = pl.ds(i * block_q, block_q)
        dq_ref[0, iq, :] = dq_ref[0, iq, :] + (jax.lax.dot_general(
            ds, kb.astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        ).astype(dq_ref.dtype)
        return dk, dv

    z = jnp.zeros((block_k, d), jnp.float32)
    dk, dv = jax.lax.fori_loop(i0, nq, body, (z, z))
    dk_ref[0] = (dk * scale).astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _compiler_params(interpret):
    # the interpreter has no Mosaic backend to pass parameters to
    if interpret:
        return {}
    return dict(compiler_params=pltpu.CompilerParams(
        vmem_limit_bytes=_VMEM_LIMIT_BYTES))


def _lens_spec():
    # full (BH,) vector in SMEM; kernels index it with program_id(0)
    return pl.BlockSpec(memory_space=pltpu.SMEM)


def _row_spec(block, d):
    return pl.BlockSpec((1, block, d), lambda bh, i: (bh, i, 0))


def _full_spec(t, d):
    return pl.BlockSpec((1, t, d), lambda bh, i: (bh, 0, 0))


def _kv_full_spec(t, d, g):
    # grouped-query attention: K/V carry B*H//g rows; query-head row bh
    # reads KV row bh // g (heads grouped consecutively), so the
    # smaller KV tensor is fetched directly — never materialized at
    # full head count
    return pl.BlockSpec((1, t, d), lambda bh, i: (bh // g, 0, 0))


def _kv_row_spec(block, d, g):
    return pl.BlockSpec((1, block, d), lambda bh, j: (bh // g, j, 0))


def _col_spec(block):
    # (BH, T, 1) per-row scalars: lane dim 1, sublane = the T block
    return pl.BlockSpec((1, block, 1), lambda bh, i: (bh, i, 0))


def _full_col_spec(t):
    return pl.BlockSpec((1, t, 1), lambda bh, i: (bh, 0, 0))


def _fwd_call(config, lens, q, k, v):
    causal, window, block_q, block_k, scale, group, interpret = config
    bh, tq, d = q.shape
    tk = k.shape[1]
    kernel = functools.partial(
        _fwd_kernel, block_q=block_q, block_k=block_k, causal=causal,
        window=window, scale=scale)
    return pl.pallas_call(
        kernel,
        grid=(bh, tq // block_q),
        in_specs=[
            _lens_spec(), _row_spec(block_q, d),
            _kv_full_spec(tk, d, group), _kv_full_spec(tk, d, group),
        ],
        out_specs=[_row_spec(block_q, d), _col_spec(block_q)],
        out_shape=[
            jax.ShapeDtypeStruct((bh, tq, d), q.dtype),
            jax.ShapeDtypeStruct((bh, tq, 1), jnp.float32),
        ],
        interpret=interpret,
        **_compiler_params(interpret),
    )(lens, q, k, v)


def _bwd_call(config, lens, q, k, v, o, lse, do):
    causal, window, block_q, block_k, scale, group, interpret = config
    bh, tq, d = q.shape
    tk = k.shape[1]
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                    axis=-1, keepdims=True)  # (BH, Tq, 1)
    dq, dk, dv = pl.pallas_call(
        functools.partial(
            _dqkv_kernel, block_q=block_q, block_k=block_k, causal=causal,
            window=window, scale=scale),
        grid=(bh, tk // block_k),
        in_specs=[
            _lens_spec(), _full_spec(tq, d),
            _kv_row_spec(block_k, d, group),
            _kv_row_spec(block_k, d, group),
            _full_spec(tq, d), _full_col_spec(tq), _full_col_spec(tq),
        ],
        out_specs=[
            # dq: index map ignores the KV grid index -> the block is
            # revisited across j, stays VMEM-resident per (b, h) row,
            # and is accumulated by the kernel (float32: the adds must
            # not round in the storage dtype)
            _full_spec(tq, d),
            # dk/dv: per QUERY-head rows even under GQA (grid programs
            # may not safely accumulate into a shared non-consecutive
            # output block); the group-sum happens outside the kernel
            _row_spec(block_k, d), _row_spec(block_k, d),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, tq, d), jnp.float32),
            jax.ShapeDtypeStruct((bh, tk, d), jnp.float32),
            jax.ShapeDtypeStruct((bh, tk, d), jnp.float32),
        ],
        interpret=interpret,
        **_compiler_params(interpret),
    )(lens, q, k, v, do, lse, delta)
    if group > 1:
        bkv = bh // group
        dk = dk.reshape(bkv, group, tk, d).sum(axis=1)
        dv = dv.reshape(bkv, group, tk, d).sum(axis=1)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _flash(config, lens, q, k, v):
    o, _ = _fwd_call(config, lens, q, k, v)
    return o


def _flash_fwd(config, lens, q, k, v):
    o, lse = _fwd_call(config, lens, q, k, v)
    return o, (lens, q, k, v, o, lse)


def _flash_bwd(config, residuals, do):
    lens, q, k, v, o, lse = residuals
    dq, dk, dv = _bwd_call(config, lens, q, k, v, o, lse, do)
    return None, dq, dk, dv


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(q, k, v, *, causal=False, key_padding_lens=None,
                    window=None, block_q=None, block_k=None,
                    interpret=False):
    """Fused attention over (B, H, T, D) tensors; differentiable.

    Exact softmax attention (no approximation): matches
    ``softmax(q k^T / sqrt(D) + mask) v`` with key-padding, causal
    and/or sliding-window masks, but never materializes the (Tq, Tk)
    weights in HBM.

    Args:
        q: (B, H, Tq, D) queries.
        k, v: (B, Hkv, Tk, D) keys/values.  ``Hkv`` may divide ``H``
            (grouped-query / multi-query attention): consecutive groups
            of ``H // Hkv`` query heads share one KV head.  The kernel
            fetches the smaller KV rows directly (index map ``bh //
            group``) — the repeated-KV tensor is never materialized, so
            serving KV caches stay at ``Hkv`` heads.
        causal: query i attends keys <= i (diagonal-aligned at 0).
        key_padding_lens: (B,) valid key lengths; keys beyond are masked.
        window: optional ``(left, right)`` sliding-window (local /
            Longformer-banded) attention: query i attends keys j with
            ``i - left <= j <= i + right``; either side may be ``None``
            for unbounded.  KV blocks outside the band are *skipped*,
            not masked — cost scales with the band width, O(T·W)
            instead of O(T^2).  Composes with ``causal`` (which caps
            the right reach at 0) and ``key_padding_lens``.
        block_q, block_k: tile sizes (multiples of 8).  Default ``None``
            auto-selects the measured v5e optimum per (T, D, mask) —
            see ``_auto_blocks`` — which is 1.7-3.4x faster than a
            128x128 tile at encoder shapes.
        interpret: run the Pallas interpreter (CPU tests).

    Returns:
        (B, H, Tq, D) attention output.  Fully-masked query rows
        (beyond ``key_padding_lens`` under ``causal`` with Tq > Tk, or
        zero-length sequences) return 0.
    """
    b, h, tq, d = q.shape
    h_kv, tk = k.shape[1], k.shape[2]
    assert h % h_kv == 0, (h, h_kv)
    group = h // h_kv
    assert k.shape == (b, h_kv, tk, d) and v.shape == (b, h_kv, tk, d), (
        q.shape, k.shape, v.shape)
    if window is None:
        window = (None, None)
    left, right = window
    assert left is None or left >= 0, window
    assert right is None or right >= 0, window
    window = (None if left is None else int(left),
              None if right is None else int(right))
    scale = 1.0 / math.sqrt(d)

    d_p = _ceil_to(d, 128)
    auto_q, auto_k = _auto_blocks(tq, tk, d_p, causal, window)
    block_q = auto_q if block_q is None else block_q
    block_k = auto_k if block_k is None else block_k
    tq_p = _ceil_to(tq, block_q)
    tk_p = _ceil_to(tk, block_k)

    def prep(x, t_p):
        x = jnp.pad(x, ((0, 0), (0, 0), (0, t_p - x.shape[2]),
                        (0, d_p - d)))
        return x.reshape(x.shape[0] * x.shape[1], t_p, d_p)

    qp, kp, vp = prep(q, tq_p), prep(k, tk_p), prep(v, tk_p)
    if key_padding_lens is None:
        lens = jnp.full((b,), tk, jnp.int32)
    else:
        lens = jnp.minimum(jnp.asarray(key_padding_lens, jnp.int32), tk)
    lens = jnp.repeat(lens[:, None], h, axis=1).reshape(b * h)

    config = (bool(causal), window, int(block_q), int(block_k),
              float(scale), int(group), bool(interpret))
    o = _flash(config, lens, qp, kp, vp)
    return o.reshape(b, h, tq_p, d_p)[:, :, :tq, :d]
