"""Sequence parallelism: ring attention over a ``seq`` mesh axis.

No reference counterpart (the reference's long-sequence story is chunking
and segmenting on one device, SURVEY.md section 2.4 "Long sequences");
this is the TPU-native extension for sequences whose activations
exceed one chip's HBM: shard the *time* axis over a mesh axis, keep
queries local, and rotate key/value blocks around the ring with
``lax.ppermute`` while accumulating attention with the online-softmax
(flash-attention) recurrence — memory per chip stays O(T/n), the
K/V transfers ride ICI, and XLA overlaps the ppermute with the local
block matmul.

Numerics: exact attention (not an approximation) — outputs match the
full softmax(QK^T)V computed on one device to float tolerance
(tested), including causal masking with global positions.
"""
import math

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

__all__ = ['ring_self_attention', 'sequence_parallel_attention']


def _ring(n, reverse=False):
    if reverse:
        return [(i, (i - 1) % n) for i in range(n)]
    return [(i, (i + 1) % n) for i in range(n)]


def ring_self_attention(q, k, v, *, axis, num_shards, causal=False,
                        scale=None, key_padding_lens=None, window=None):
    """Per-shard ring attention body (call inside ``shard_map``).

    Args:
        q, k, v: (B, H, T_local, D) — the local sequence block of each
            array, sharded over ``axis``.
        axis: mesh axis name carrying the sequence shards.
        num_shards: static number of sequence shards.
        causal: apply causal masking with *global* positions.
        key_padding_lens: (B,) valid key lengths (global); padded keys
            are excluded from every softmax.  Query rows past the
            sequence length are NOT masked: they attend the valid keys
            like any other row, so their outputs are well-defined but
            meaningless don't-care values (same as the dense path) —
            mask them downstream before any reduction over T.
        window: optional ``(left, right)`` sliding window with *global*
            positions (either side ``None`` = unbounded).  Beyond
            masking, the band PRUNES the ring: every shard needs only
            the ``ceil(left/T_local)`` KV blocks to its left and
            ``ceil((right + T_local - 1)/T_local)`` to its right — the
            same *relative* ring offsets on every shard — so the full
            ring is replaced by two short rings (forward and reverse
            ``ppermute``), and both ICI traffic and compute drop to
            O(band) instead of O(T).

    Returns:
        (B, H, T_local, D) attention output for the local queries.
    """
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    s = jax.lax.axis_index(axis)
    t_local = q.shape[2]
    neg = jnp.finfo(jnp.float32).min
    left, right = (None, None) if window is None else window
    if causal:
        right = 0  # causal caps the right reach whatever the window says

    q_pos = s * t_local + jnp.arange(t_local)          # global q rows

    def accumulate(carry, k_blk, v_blk, blk):
        """Online-softmax update of (m, l, acc) with one KV block."""
        m, l, acc = carry
        logits = jnp.einsum(
            'bhqd,bhkd->bhqk', q, k_blk,
            preferred_element_type=jnp.float32) * scale
        k_pos = blk * t_local + jnp.arange(t_local)
        if causal:
            mask = k_pos[None, :] > q_pos[:, None]
            logits = jnp.where(mask[None, None], neg, logits)
        if left is not None:
            mask = q_pos[:, None] - k_pos[None, :] > left
            logits = jnp.where(mask[None, None], neg, logits)
        if right is not None and not causal:
            mask = k_pos[None, :] - q_pos[:, None] > right
            logits = jnp.where(mask[None, None], neg, logits)
        if key_padding_lens is not None:
            lens = jnp.asarray(key_padding_lens)
            pad = k_pos[None, :] >= lens[:, None]      # (B, Tk)
            logits = jnp.where(pad[:, None, None, :], neg, logits)
        m_blk = jnp.max(logits, axis=-1, keepdims=True)
        m_new = jnp.maximum(m, m_blk)
        # guard fully-masked blocks (exp(neg - neg) would be 1)
        p = jnp.exp(logits - m_new)
        p = jnp.where(logits <= neg / 2, 0.0, p)
        correction = jnp.exp(m - m_new)
        correction = jnp.where(m <= neg / 2, 0.0, correction)
        l_new = l * correction + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * correction + jnp.einsum(
            'bhqk,bhkd->bhqd', p.astype(v_blk.dtype), v_blk,
            preferred_element_type=jnp.float32)
        return m_new, l_new, acc_new

    b, h, t, d = q.shape
    m0 = jnp.full((b, h, t, 1), neg, jnp.float32)
    l0 = jnp.zeros((b, h, t, 1), jnp.float32)
    acc0 = jnp.zeros((b, h, t, d), jnp.float32)

    # how many ring hops each side of the band actually reaches
    hops_l = num_shards - 1 if left is None else min(
        num_shards - 1, -(-left // t_local))
    hops_r = 0 if causal else (
        num_shards - 1 if right is None else min(
            num_shards - 1, (right + t_local - 1) // t_local))

    if hops_l + hops_r >= num_shards - 1:
        # band covers the whole ring — classic single full ring.
        # Accumulate the LOCAL block first, then permute-before-
        # accumulate for the remaining n-1 hops: an accumulate-then-
        # permute body would pay one final ppermute of K AND V whose
        # result is discarded (XLA cannot DCE a collective inside a
        # uniform scan body).
        def step(carry, i):
            k_blk, v_blk, mla = carry
            k_blk = jax.lax.ppermute(k_blk, axis, _ring(num_shards))
            v_blk = jax.lax.ppermute(v_blk, axis, _ring(num_shards))
            # the block held after i hops originated on shard s - i
            mla = accumulate(mla, k_blk, v_blk, (s - i) % num_shards)
            return (k_blk, v_blk, mla), None

        mla = accumulate((m0, l0, acc0), k, v, s)
        (_, _, (_, l, acc)), _ = jax.lax.scan(
            step, (k, v, mla), jnp.arange(1, num_shards))
        return (acc / jnp.maximum(l, 1e-30)).astype(q.dtype)

    # banded: local block + two short rings.  Blocks that wrap past the
    # sequence edge are fully masked by the band (their global positions
    # are outside it), so edge shards stay correct.
    mla = accumulate((m0, l0, acc0), k, v, s)

    def step_left(carry, i):
        k_blk, v_blk, mla = carry
        k_blk = jax.lax.ppermute(k_blk, axis, _ring(num_shards))
        v_blk = jax.lax.ppermute(v_blk, axis, _ring(num_shards))
        mla = accumulate(mla, k_blk, v_blk, (s - i) % num_shards)
        return (k_blk, v_blk, mla), None

    def step_right(carry, i):
        k_blk, v_blk, mla = carry
        k_blk = jax.lax.ppermute(k_blk, axis, _ring(num_shards, True))
        v_blk = jax.lax.ppermute(v_blk, axis, _ring(num_shards, True))
        mla = accumulate(mla, k_blk, v_blk, (s + i) % num_shards)
        return (k_blk, v_blk, mla), None

    if hops_l:
        (_, _, mla), _ = jax.lax.scan(
            step_left, (k, v, mla), jnp.arange(1, hops_l + 1))
    if hops_r:
        (_, _, mla), _ = jax.lax.scan(
            step_right, (k, v, mla), jnp.arange(1, hops_r + 1))
    _, l, acc = mla
    return (acc / jnp.maximum(l, 1e-30)).astype(q.dtype)


def sequence_parallel_attention(q, k, v, *, mesh: Mesh,
                                axis: str = 'seq', causal=False,
                                scale=None, key_padding_lens=None,
                                window=None):
    """Exact attention with the sequence axis sharded over ``axis``.

    Args:
        q, k, v: (B, H, T, D) full arrays; T must divide by the mesh
            axis size.  They are sharded on T, attention runs as a
            K/V ring, and the (B, H, T, D) output comes back sharded
            the same way (replicate/reshard is the caller's choice).
        key_padding_lens: optional (B,) valid lengths (replicated).
        window: optional ``(left, right)`` sliding window; prunes the
            ring to the shards the band reaches (see
            :func:`ring_self_attention`).
    """
    n = mesh.shape[axis]
    spec = P(None, None, axis, None)
    if window is not None:
        left, right = window
        assert left is None or left >= 0, window
        assert right is None or right >= 0, window

    if key_padding_lens is None:
        def body(q_l, k_l, v_l):
            return ring_self_attention(
                q_l, k_l, v_l, axis=axis, num_shards=n, causal=causal,
                scale=scale, window=window)

        return shard_map(
            body, mesh=mesh, in_specs=(spec, spec, spec),
            out_specs=spec, check_rep=False,
        )(q, k, v)

    def body(q_l, k_l, v_l, lens):
        return ring_self_attention(
            q_l, k_l, v_l, axis=axis, num_shards=n, causal=causal,
            scale=scale, key_padding_lens=lens, window=window)

    return shard_map(
        body, mesh=mesh, in_specs=(spec, spec, spec, P()),
        out_specs=spec, check_rep=False,
    )(q, k, v, jnp.asarray(key_padding_lens))
