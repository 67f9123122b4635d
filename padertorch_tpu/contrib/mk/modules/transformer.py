"""Transformer encoder/decoder with RoPE.

Reference parity: ``padertorch/contrib/mk/modules/transformer.py`` —
``RoPE`` (rotary embeddings), ``MultiheadAttention`` (with key padding and
causal masks), ``TransformerEncoder``/``TransformerDecoder``,
``DynamicTanh`` normalization alternative.

TPU notes: attention is one fused softmax(QK^T)V chain that XLA maps onto
the MXU; masks are additive -inf biases (static shapes).  bf16-friendly:
matmuls specify ``preferred_element_type=float32`` accumulation.
"""
import math

import numpy as np
import jax
import jax.numpy as jnp

from padertorch_tpu.base import Module
from padertorch_tpu import nn
from padertorch_tpu import random as ptrandom
from padertorch_tpu.ops.sequence.mask import compute_mask

__all__ = [
    'RoPE',
    'MultiheadAttention',
    'ScaledDotProductAttention',
    'TransformerNormBlock',
    'EncoderLayer',
    'TransformerEncoderLayer',
    'TransformerEncoder',
    'TransformerDecoderLayer',
    'TransformerDecoder',
    'DynamicTanh',
    'CondLayerNorm',
    'PositionalConvEmbedding',
    'PositionalEncoding',
    'positional_embedding',
    'interleave',
    'MPLinear',
    'set_attention_backend',
    'autoregressive_generate',
    'beam_search_generate',
    'speculative_generate',
]


class RoPE(Module):
    """Rotary position embeddings (Su et al. 2021). Reference: mk/transformer.py:231."""

    def __init__(self, d_head, base=10000.0):
        assert d_head % 2 == 0, d_head
        self.d_head = d_head
        self.base = base
        inv_freq = 1.0 / (
            base ** (np.arange(0, d_head, 2) / d_head))
        self.register_buffer(
            'inv_freq', jnp.asarray(inv_freq, dtype='float32'))

    def forward(self, x, offset=0):
        """x: (B, H, T, D) -> rotated; ``offset`` may be traced (the
        KV-cache decode position), a scalar or a per-row (B,) vector
        (continuous batching: each batch slot at its own position)."""
        t = x.shape[-2]
        offset = jnp.asarray(offset)
        if offset.ndim == 1:  # per-row positions
            pos = offset[:, None] + jnp.arange(t)[None, :]   # (B, T)
            angles = pos[..., None] * self.inv_freq          # (B, T, D/2)
            sin = jnp.sin(angles)[:, None]                   # (B,1,T,D/2)
            cos = jnp.cos(angles)[:, None]
            x1, x2 = jnp.split(x, 2, axis=-1)
            rot1 = x1 * cos - x2 * sin
            rot2 = x2 * cos + x1 * sin
            return jnp.concatenate([rot1, rot2], -1).astype(x.dtype)
        pos = (offset + jnp.arange(t))[:, None]  # (T, 1)
        angles = pos * self.inv_freq[None, :]  # (T, D/2)
        sin = jnp.sin(angles)
        cos = jnp.cos(angles)
        x1, x2 = jnp.split(x, 2, axis=-1)
        rot1 = x1 * cos - x2 * sin
        rot2 = x2 * cos + x1 * sin
        return jnp.concatenate([rot1, rot2], axis=-1).astype(x.dtype)


class DynamicTanh(Module):
    """DyT normalization-free layer (Zhu 2025). Reference: mk/transformer.py:459."""

    def __init__(self, d_model, alpha0=0.5):
        self.alpha = jnp.full((1,), alpha0)
        self.weight = jnp.ones((d_model,))
        self.bias = jnp.zeros((d_model,))

    def forward(self, x):
        return self.weight * jnp.tanh(self.alpha * x) + self.bias


class MultiheadAttention(Module):
    """MHA with optional RoPE, causal and key-padding masks.

    Reference parity: ``mk/modules/transformer.py:549``.
    """

    def __init__(self, d_model, num_heads, dropout=0.0, use_rope=False,
                 d_kv=None, use_flash='auto', bias=True, d_v=None,
                 qk_norm=None, add_bias_kv=False,
                 linear_attention_bias=False,
                 magnitude_preserving=False, num_kv_heads=None):
        """Long-tail reference options (``mk/transformer.py:549-645``):
        ``bias`` (projection bias), ``d_kv``/``d_v`` (separate key /
        value input dims, the reference's kdim/vdim), ``qk_norm`` in
        {'rms', 'l2'} ('rms' = per-head RMSNorm on q and k before RoPE,
        the reference's ``rms_norm``; 'l2' = unit-normalize q and k
        after RoPE, the reference's ``l2_normalization``),
        ``add_bias_kv`` (a learned extra key/value token),
        ``linear_attention_bias`` (symmetric distance penalty
        ``-|i - j| * slope_h``, slopes ``linspace(8/H, 8, H)``),
        ``magnitude_preserving`` (projections on the unit sphere via
        :class:`MPLinear`, Karras et al. 2024)."""
        assert d_model % num_heads == 0, (d_model, num_heads)
        self.d_model = d_model
        self.num_heads = num_heads
        self.d_head = d_model // num_heads
        # grouped-query attention: Hkv KV heads shared by groups of
        # H // Hkv query heads (Hkv=1 = multi-query).  Shrinks the K/V
        # projections and — the production point — the decode KV cache
        # by H/Hkv; the fused attention backend fetches the small KV
        # directly (never repeats it in HBM).
        self.num_kv_heads = num_kv_heads or num_heads
        assert num_heads % self.num_kv_heads == 0, (
            num_heads, num_kv_heads)
        d_kv_out = self.num_kv_heads * self.d_head
        d_kv = d_kv or d_model
        d_v = d_v or d_kv

        def make(d_in, d_out=d_model):
            if magnitude_preserving:
                return MPLinear(d_in, d_out, bias=bias,
                                magnitude_preserving=True)
            return nn.Linear(d_in, d_out, bias=bias)

        self.q_proj = make(d_model)
        self.k_proj = make(d_kv, d_kv_out)
        self.v_proj = make(d_v, d_kv_out)
        self.out_proj = make(d_model)
        assert qk_norm in (None, 'rms', 'l2'), qk_norm
        self.qk_norm = qk_norm
        if qk_norm == 'rms':
            self.q_norm = nn.RMSNorm(self.d_head)
            self.k_norm = nn.RMSNorm(self.d_head)
        if add_bias_kv:
            # the reference concatenates the bias to the PRE-projection
            # key/value inputs (mk/transformer.py:666-682; sized for the
            # respective input dims so kdim/vdim also compose)
            std_k, std_v = (math.sqrt(2.0 / (1 + d)) for d in (d_kv, d_v))
            self.bias_k = std_k * jax.random.normal(
                ptrandom.init_key(), (1, 1, d_kv))
            self.bias_v = std_v * jax.random.normal(
                ptrandom.init_key(), (1, 1, d_v))
        else:
            self.bias_k = self.bias_v = None
        self.linear_attention_bias = linear_attention_bias
        self.dropout = nn.Dropout(dropout) if dropout else None
        self.rope = RoPE(self.d_head) if use_rope else None
        # fused attention backend (ops/pallas/attention.py): exact
        # softmax attention without the HBM (Tq, Tk) logits tensor.
        # Eligible when no additive attn_bias and attention-dropout is
        # inactive.  'auto' (default) additionally dispatches on the
        # measured flash-vs-XLA crossover per (T, causal, window) —
        # see ops.pallas.attention.should_use_flash — so short/dense
        # shapes keep XLA's faster fused path; True forces the kernel
        # (incl. the CPU interpreter, for tests), False forces dense.
        self.use_flash = use_flash
        # sequence parallelism: set via set_sequence_mesh() to compute
        # self-attention as a K/V ring over a 'seq' mesh axis
        self.seq_mesh = None
        self.seq_axis = 'seq'

    def set_sequence_mesh(self, mesh, axis='seq'):
        """Enable ring-attention sequence parallelism: self-attention
        runs with the time axis sharded over ``axis`` of ``mesh``
        (``parallel/sequence.py``); exact numerics (tested)."""
        self.seq_mesh = mesh
        self.seq_axis = axis
        return self

    def _split(self, x, heads=None):
        b, t, _ = x.shape
        heads = heads or self.num_heads
        return jnp.transpose(
            x.reshape(b, t, heads, self.d_head), (0, 2, 1, 3))

    def _kv_heads(self):
        return getattr(self, 'num_kv_heads', self.num_heads)

    def _expand_kv(self, x):
        """(B, Hkv, T, D) -> (B, H, T, D) for the dense/ring paths."""
        g = self.num_heads // self._kv_heads()
        return x if g == 1 else jnp.repeat(x, g, axis=1)

    def forward(self, query, key=None, value=None, key_padding_lens=None,
                causal=False, attn_bias=None, attn_window=None):
        """query (B, Tq, D); key/value default to query (self-attention).

        ``attn_bias``: additive logits bias broadcastable to
        (B, H, Tq, Tk) — the hook the reference's attention variants
        (ALiBi/KERPLE, ``mk/.../ssl/wav2vec2/components.py``) plug into.

        ``attn_window``: ``(left, right)`` sliding-window (banded /
        Longformer) attention — query i attends keys in
        ``[i - left, i + right]`` (either side ``None`` = unbounded).
        Unlike an additive band bias this composes with the fused
        attention backend, which *skips* out-of-band KV blocks
        (O(T·W) cost instead of O(T^2) — doc/performance.md).
        """
        if key is None:
            key = query
        if value is None:
            value = key
        bias_kv = getattr(self, 'bias_k', None) is not None
        if bias_kv:
            # learned extra key/value token appended to the inputs
            assert not causal and attn_window is None, \
                'add_bias_kv composes with padding, not causal/window'
            n = key.shape[0]
            key = jnp.concatenate(
                [key, jnp.broadcast_to(
                    self.bias_k, (n, 1, key.shape[-1]))], axis=1)
            value = jnp.concatenate(
                [value, jnp.broadcast_to(
                    self.bias_v, (n, 1, value.shape[-1]))], axis=1)
        q = self._split(self.q_proj(query))
        k = self._split(self.k_proj(key), self._kv_heads())
        v = self._split(self.v_proj(value), self._kv_heads())
        if getattr(self, 'qk_norm', None) == 'rms':
            q = self.q_norm(q)
            k = self.k_norm(k)
        if self.rope is not None:
            q = self.rope(q)
            k = self.rope(k)
        if getattr(self, 'qk_norm', None) == 'l2':
            q = q / jnp.maximum(
                jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
            k = k / jnp.maximum(
                jnp.linalg.norm(k, axis=-1, keepdims=True), 1e-12)
        if getattr(self, 'linear_attention_bias', False):
            if getattr(self, 'use_flash', False) is True:
                # only warn on an EXPLICIT use_flash=True; 'auto'
                # silently (and correctly) picks the dense path
                import warnings
                warnings.warn(
                    'linear_attention_bias is an additive bias: the '
                    'fused attention backend is bypassed and the dense '
                    'O(T^2) path runs.', stacklevel=2)
            # symmetric ALiBi-style distance penalty (reference
            # mk/transformer.py:707-724): -|i - j| * slope_h
            dist = -jnp.abs(
                jnp.arange(k.shape[2])[None, :]
                - jnp.arange(q.shape[2])[:, None]).astype(jnp.float32)
            slopes = jnp.linspace(
                8.0 / self.num_heads, 8.0, self.num_heads)
            lin = slopes[:, None, None] * dist[None]
            attn_bias = lin[None] if attn_bias is None \
                else attn_bias + lin[None]
        if self.seq_mesh is not None and key is query and not bias_kv:
            if attn_bias is not None or (
                    self.dropout is not None and self.training):
                import warnings
                warnings.warn(
                    'set_sequence_mesh ignored: ring attention does '
                    'not support attn_bias / attention dropout — '
                    'falling back to dense O(T^2) attention.',
                    stacklevel=2)
            else:
                from padertorch_tpu.parallel.sequence import (
                    sequence_parallel_attention)
                out = sequence_parallel_attention(
                    q, self._expand_kv(k), self._expand_kv(v),
                    mesh=self.seq_mesh, axis=self.seq_axis,
                    causal=causal, key_padding_lens=key_padding_lens,
                    window=attn_window)
                b, h, t, d = out.shape
                out = jnp.transpose(
                    out, (0, 2, 1, 3)).reshape(b, t, h * d)
                return self.out_proj(out)
        use_flash = getattr(self, 'use_flash', False)
        if (use_flash and attn_bias is None
                and not bias_kv
                and (self.dropout is None or not self.training)):
            from padertorch_tpu.ops.pallas.attention import (
                flash_attention, should_use_flash)
            # 'auto' (the default) dispatches on the measured
            # flash-vs-XLA crossover; True forces the kernel (incl. the
            # CPU interpreter for tests), False forces the dense path
            if use_flash is True or should_use_flash(
                    q.shape[2], k.shape[2], causal=causal,
                    window=attn_window):
                out = flash_attention(
                    q, k, v, causal=causal,
                    key_padding_lens=key_padding_lens,
                    window=attn_window,
                    interpret=jax.default_backend() != 'tpu')
                b, h, t, d = out.shape
                out = jnp.transpose(
                    out, (0, 2, 1, 3)).reshape(b, t, h * d)
                return self.out_proj(out)
        k = self._expand_kv(k)
        v = self._expand_kv(v)
        scale = 1.0 / math.sqrt(self.d_head)
        logits = jnp.einsum(
            'bhqd,bhkd->bhqk', q, k,
            preferred_element_type=jnp.float32) * scale
        if attn_bias is not None:
            logits = logits + attn_bias
        if key_padding_lens is not None:
            lens = jnp.asarray(key_padding_lens)
            pos = jnp.arange(k.shape[2])
            pad = pos[None, :] >= lens[:, None]
            if bias_kv:  # the appended bias token is always attendable
                pad = pad & (pos[None, :] != k.shape[2] - 1)
            logits = jnp.where(
                pad[:, None, None, :], jnp.finfo(logits.dtype).min, logits)
        if causal:
            tq, tk = q.shape[2], k.shape[2]
            cmask = jnp.arange(tk)[None, :] > jnp.arange(tq)[:, None]
            logits = jnp.where(
                cmask[None, None], jnp.finfo(logits.dtype).min, logits)
        if attn_window is not None:
            left, right = attn_window
            diff = (jnp.arange(k.shape[2])[None, :]
                    - jnp.arange(q.shape[2])[:, None])  # col - row
            outside = jnp.zeros_like(diff, bool)
            if left is not None:
                outside = outside | (diff < -left)
            if right is not None:
                outside = outside | (diff > right)
            logits = jnp.where(
                outside[None, None], jnp.finfo(logits.dtype).min, logits)
        weights = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
        if self.dropout is not None:
            weights = self.dropout(weights)
        out = jnp.einsum('bhqk,bhkd->bhqd', weights, v)
        b, h, t, d = out.shape
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(b, t, h * d)
        return self.out_proj(out)

    # ---- KV-cache incremental decoding (serving) -------------------
    # TPU-native AR inference: the cache is a PREALLOCATED static-shape
    # (B, H, T_max, Dh) buffer updated in place with
    # ``lax.dynamic_update_slice`` at a traced position, so ONE
    # compiled step program serves every decode position (no per-step
    # recompiles, no dynamic shapes) and the whole generation loop can
    # live inside one ``lax.scan``.  No reference counterpart (the
    # reference decoder recomputes full causal attention per step,
    # ``mk/modules/transformer.py:1027``).

    def init_cache(self, batch_size, max_len, dtype=jnp.float32):
        """Preallocate the self-attention K/V cache (a pytree leaf
        pair); under grouped-query attention it holds only the
        ``num_kv_heads`` KV heads — H/Hkv less HBM per cached token."""
        shape = (batch_size, self._kv_heads(), max_len, self.d_head)
        return {'k': jnp.zeros(shape, dtype), 'v': jnp.zeros(shape, dtype)}

    def precompute_kv(self, key, value=None):
        """Project encoder memory to K/V once per sequence; reuse every
        decode step (cross-attention's K/V never change).

        ``add_bias_kv`` composes: the learned bias token is appended to
        the memory before projection (and stays attendable under
        padding in :meth:`attend_cached`)."""
        if value is None:
            value = key
        if getattr(self, 'bias_k', None) is not None:
            n = key.shape[0]
            key = jnp.concatenate(
                [key, jnp.broadcast_to(
                    self.bias_k, (n, 1, key.shape[-1]))], axis=1)
            value = jnp.concatenate(
                [value, jnp.broadcast_to(
                    self.bias_v, (n, 1, value.shape[-1]))], axis=1)
        return {'k': self._split(self.k_proj(key), self._kv_heads()),
                'v': self._split(self.v_proj(value), self._kv_heads())}

    def _attend(self, q, k, v, mask, bias=None):
        k = self._expand_kv(k)
        v = self._expand_kv(v)
        scale = 1.0 / math.sqrt(self.d_head)
        logits = jnp.einsum(
            'bhqd,bhkd->bhqk', q, k,
            preferred_element_type=jnp.float32) * scale
        if bias is not None:
            logits = logits + bias
        logits = jnp.where(mask, jnp.finfo(logits.dtype).min, logits)
        weights = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
        out = jnp.einsum('bhqk,bhkd->bhqd', weights, v)
        b, h, t, d = out.shape
        return self.out_proj(
            jnp.transpose(out, (0, 2, 1, 3)).reshape(b, t, h * d))

    def _qk_normalize(self, q, k, rope_offset=0):
        """The forward()'s q/k normalization order for the decode path:
        per-head RMSNorm before RoPE, L2 after.  ``rope_offset`` may be
        traced (never ``or``-coerced — that breaks under jit)."""
        if getattr(self, 'qk_norm', None) == 'rms':
            q = self.q_norm(q)
            k = self.k_norm(k)
        if self.rope is not None:
            q = self.rope(q, offset=rope_offset)
            k = self.rope(k, offset=rope_offset)
        if getattr(self, 'qk_norm', None) == 'l2':
            q = q / jnp.maximum(
                jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
            k = k / jnp.maximum(
                jnp.linalg.norm(k, axis=-1, keepdims=True), 1e-12)
        return q, k

    def attend_cached(self, query, kv, key_padding_lens=None):
        """Cross-attention against :meth:`precompute_kv` output."""
        q = self._split(self.q_proj(query))
        k, v = kv['k'], kv['v']
        if getattr(self, 'qk_norm', None) == 'rms':
            # k in the cache is already normalized iff precompute did it
            # — precompute_kv stores RAW projections, so normalize both
            # here to mirror forward()
            q = self.q_norm(q)
            k = self.k_norm(k)
        if getattr(self, 'qk_norm', None) == 'l2':
            q = q / jnp.maximum(
                jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
            k = k / jnp.maximum(
                jnp.linalg.norm(k, axis=-1, keepdims=True), 1e-12)
        pos = jnp.arange(k.shape[2])
        if key_padding_lens is not None:
            lens = jnp.asarray(key_padding_lens)
            mask = (pos[None, :] >= lens[:, None])
            if getattr(self, 'bias_k', None) is not None:
                mask = mask & (pos[None, :] != k.shape[2] - 1)
            mask = mask[:, None, None, :]
        else:
            mask = jnp.zeros((1, 1, 1, k.shape[2]), bool)
        return self._attend(q, k, v, mask)

    def decode_step(self, query, cache, index):
        """Causal self-attention for new tokens at ``[index, index+Tq)``.

        Mirrors :meth:`forward`'s option set where it is well-defined
        for incremental decoding: RoPE (absolute offset), ``qk_norm``
        and ``linear_attention_bias`` compose; ``add_bias_kv`` does not
        (its extra token has no stable cache position) and is rejected.

        Args:
            query: (B, Tq, D) — Tq=1 for stepwise decode; Tq>1 prefills
                a whole prompt chunk in one call (still causal).
            cache: from :meth:`init_cache` (or the previous step).
            index: first position of ``query`` — int/traced scalar, or
                a per-row (B,) vector (continuous batching: every slot
                decodes at its own position in one call).

        Returns:
            ``(out, cache)`` — (B, Tq, D) output and the updated cache.
        """
        assert getattr(self, 'bias_k', None) is None, \
            'add_bias_kv is not supported in cached self-attention decode'
        q = self._split(self.q_proj(query))
        k_new = self._split(self.k_proj(query), self._kv_heads())
        v_new = self._split(self.v_proj(query), self._kv_heads())
        q, k_new = self._qk_normalize(q, k_new, rope_offset=index)
        index = jnp.asarray(index)
        if index.ndim == 1:
            # per-row cache writes: vmap the slice update over batch
            def write(buf, new, i):
                return jax.vmap(
                    lambda b, n, j: jax.lax.dynamic_update_slice_in_dim(
                        b, n, j, axis=1)
                )(buf, new.astype(buf.dtype), i)
            k = write(cache['k'], k_new, index)
            v = write(cache['v'], v_new, index)
            rows = index[:, None] + jnp.arange(q.shape[2])  # (B, Tq)
            cols = jnp.arange(k.shape[2])
            mask = (cols[None, None, :]
                    > rows[:, :, None])[:, None]            # (B,1,Tq,Tk)
            dist_rows = rows[:, None, :, None]
        else:
            k = jax.lax.dynamic_update_slice_in_dim(
                cache['k'], k_new.astype(cache['k'].dtype), index, axis=2)
            v = jax.lax.dynamic_update_slice_in_dim(
                cache['v'], v_new.astype(cache['v'].dtype), index, axis=2)
            # causal over global positions; unwritten cache slots are
            # all beyond index + Tq - 1, so the same mask hides them
            rows = index + jnp.arange(q.shape[2])
            cols = jnp.arange(k.shape[2])
            mask = (cols[None, :] > rows[:, None])[None, None]
            dist_rows = rows[None, None, :, None]
        bias = None
        if getattr(self, 'linear_attention_bias', False):
            dist = -jnp.abs(
                cols[None, None, None, :] - dist_rows
            ).astype(jnp.float32)                           # (.,1,Tq,Tk)
            slopes = jnp.linspace(
                8.0 / self.num_heads, 8.0, self.num_heads)
            bias = slopes[None, :, None, None] * dist
        return self._attend(q, k, v, mask, bias=bias), {'k': k, 'v': v}

    # ---- rolling (sliding-window) cache: O(W) memory generation ----

    def init_rolling_cache(self, batch_size, window, dtype=jnp.float32):
        """Cache for LOCAL causal attention: only the last ``window``
        keys/values are kept (a ring buffer indexed ``t % window``), so
        generation memory is O(W) instead of O(T_max) — the serving
        side of ``attn_window=(window - 1, 0)`` local attention."""
        shape = (batch_size, self._kv_heads(), window, self.d_head)
        return {'k': jnp.zeros(shape, dtype), 'v': jnp.zeros(shape, dtype)}

    def decode_step_rolling(self, query, cache, index):
        """One-token local-attention decode against the ring buffer.

        Equals :meth:`forward` with ``causal=True, attn_window=(W-1,
        0)`` at position ``index`` (tested, incl. RoPE — keys are
        rotated by their ABSOLUTE position at write time, so rotations
        stay correct after wraparound).
        """
        assert getattr(self, 'bias_k', None) is None, \
            'add_bias_kv is not supported in cached self-attention decode'
        assert query.shape[1] == 1, (
            'rolling decode is one token at a time', query.shape)
        q = self._split(self.q_proj(query))
        k_new = self._split(self.k_proj(query), self._kv_heads())
        v_new = self._split(self.v_proj(query), self._kv_heads())
        q, k_new = self._qk_normalize(q, k_new, rope_offset=index)
        w = cache['k'].shape[2]
        slot = index % w
        k = jax.lax.dynamic_update_slice_in_dim(
            cache['k'], k_new.astype(cache['k'].dtype), slot, axis=2)
        v = jax.lax.dynamic_update_slice_in_dim(
            cache['v'], v_new.astype(cache['v'].dtype), slot, axis=2)
        # absolute position held by each slot after this write; slots
        # not yet written resolve to negative positions and are masked
        cols = jnp.arange(w)
        pos = index - ((index - cols) % w)
        mask = (pos < 0)[None, None, None, :]
        bias = None
        if getattr(self, 'linear_attention_bias', False):
            dist = -(index - pos).astype(jnp.float32)     # <= 0
            slopes = jnp.linspace(
                8.0 / self.num_heads, 8.0, self.num_heads)
            bias = (slopes[:, None, None]
                    * dist[None, None, :][None])
        return self._attend(q, k, v, mask, bias=bias), {'k': k, 'v': v}


class _FFN(Module):
    def __init__(self, d_model, d_ff, dropout=0.0, activation='gelu',
                 pre_activation=False):
        self.lin1 = nn.Linear(d_model, d_ff)
        self.lin2 = nn.Linear(d_ff, d_model)
        self.dropout = nn.Dropout(dropout) if dropout else None
        self.activation = activation
        # reference `pre_activation` MLP (mk/transformer.py:859):
        # activation also applied to the block input
        self.pre_activation = pre_activation

    def forward(self, x):
        act = getattr(jax.nn, self.activation)
        if getattr(self, 'pre_activation', False):
            x = act(x)
        h = act(self.lin1(x))
        if self.dropout is not None:
            h = self.dropout(h)
        return self.lin2(h)


def _make_norm(norm, d_model):
    if norm == 'dyt':
        return DynamicTanh(d_model)
    if norm == 'rms':
        return nn.RMSNorm(d_model)
    return nn.LayerNorm(d_model)


class CondLayerNorm(Module):
    """Conditionally-modulated LayerNorm (AdaLN).

    Reference parity: ``mk/modules/transformer.py:363-459`` — normalize
    WITHOUT learned affine, then modulate with scale/shift(/layer-scale)
    projected from a conditioning vector:
    ``y = norm(x) * gamma(c) [+ beta(c)]``, returning the optional
    layer-scale ``alpha(c)`` for the residual branch
    (``softplus(alpha)`` gating in the encoder layer).

    ``zero_init`` zeroes the layer-scale head, making the residual gate
    START input-independent — ``alpha(c) = 0`` for every ``c``, so the
    gate is the constant ``softplus(0) = ln 2`` until training moves it
    (the reference's zero-init semantics, ``mk/transformer.py:399``;
    note this is NOT an identity/zero gate — the branch starts at
    0.693x, and gamma/beta stay randomly modulated).
    """

    def __init__(self, d_model, cond_dim, bias=True, layer_scale=False,
                 zero_init=False, eps=1e-5):
        self.d_model = d_model
        self.eps = eps
        self.shift = bias
        self.layer_scale = layer_scale
        n = 1 + bias + layer_scale
        self.cond_layer = nn.Linear(cond_dim, n * d_model)
        if layer_scale and zero_init:
            w = self.cond_layer.weight.at[:, -d_model:].set(0.0)
            b = self.cond_layer.bias.at[-d_model:].set(0.0)
            self.cond_layer.weight, self.cond_layer.bias = w, b

    def forward(self, x, cond=None):
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + self.eps)
        if cond is None:
            return y, None
        params = self.cond_layer(cond)
        while params.ndim < y.ndim:       # (B, nD) -> (B, 1, nD)
            params = params[:, None]
        parts = jnp.split(params, 1 + self.shift + self.layer_scale,
                          axis=-1)
        if self.shift and self.layer_scale:
            gamma, beta, alpha = parts
        elif self.shift:
            (gamma, beta), alpha = parts, None
        elif self.layer_scale:
            (gamma, alpha), beta = parts, None
        else:
            (gamma,), beta, alpha = parts, None, None
        y = y * gamma
        if beta is not None:
            y = y + beta
        return y, alpha


class ScaledDotProductAttention(Module):
    """Bare attention kernel as a Module (reference
    ``mk/transformer.py:273``): ``softmax(q k^T / sqrt(d) + mask) v``.

    The reference's ``enable_flash``/``enable_mem_efficient`` select
    torch SDPA backends; under XLA the materializing path is already
    fused, and the Pallas flash kernel is opt-in via
    :func:`set_attention_backend` on the owning MHA module — so the
    flags are accepted for signature parity and ignored.

    ``attn_mask``: boolean (True = attend) or additive float mask,
    broadcastable to (..., Tq, Tk).
    """

    def __init__(self, *args, enable_flash=None,
                 enable_mem_efficient=None, magnitude_preserving=False,
                 **kwargs):
        del args, kwargs
        self.enable_flash = enable_flash
        self.enable_mem_efficient = enable_mem_efficient
        self.magnitude_preserving = magnitude_preserving

    def forward(self, q, k, v, attn_mask=None, is_causal=False):
        d = q.shape[-1]
        if self.magnitude_preserving:
            q = q / jnp.maximum(
                jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-4)
            k = k / jnp.maximum(
                jnp.linalg.norm(k, axis=-1, keepdims=True), 1e-4)
        logits = jnp.einsum('...qd,...kd->...qk', q, k) / jnp.sqrt(
            jnp.asarray(d, q.dtype))
        if is_causal:
            tq, tk = logits.shape[-2:]
            causal = jnp.tril(jnp.ones((tq, tk), bool), k=tk - tq)
            logits = jnp.where(causal, logits, -jnp.inf)
        if attn_mask is not None:
            if attn_mask.dtype == jnp.bool_:
                logits = jnp.where(attn_mask, logits, -jnp.inf)
            else:
                logits = logits + attn_mask
        weights = jax.nn.softmax(logits, axis=-1)
        # fully-masked rows: softmax of all -inf is nan -> zero output
        weights = jnp.where(jnp.isnan(weights), 0.0, weights)
        return jnp.einsum('...qk,...kd->...qd', weights, v)


class TransformerNormBlock(Module):
    """Norm wrapper unifying plain and AdaLN-conditioned norms
    (reference ``mk/transformer.py:766``): without ``cond`` it returns
    the normed tensor; with ``cond`` it returns ``(h, layer_scale)``
    for the residual gate."""

    def __init__(self, norm, d_model, cond_dim=None):
        if cond_dim is not None:
            self.norm = CondLayerNorm(
                d_model, cond_dim, layer_scale=True)
        else:
            self.norm = _make_norm(norm, d_model)
        self._conditional = cond_dim is not None

    def forward(self, inputs, cond=None):
        if self._conditional:
            h, layer_scale = self.norm(inputs, cond=cond)
            if cond is None:
                return h
            return h, layer_scale
        assert cond is None, 'norm built without cond_dim'
        return self.norm(inputs)


class TransformerEncoderLayer(Module):
    def __init__(self, d_model, num_heads, d_ff=None, dropout=0.0,
                 use_rope=True, norm='layer_norm', pre_norm=True,
                 cond_dim=None, normalize_skip_connections=False,
                 pre_activation=False, zero_init=False,
                 num_kv_heads=None):
        """``cond_dim``: enable AdaLN conditioning — ``forward`` takes a
        per-example ``cond`` vector, norms become :class:`CondLayerNorm`
        and the residual branches are gated by ``softplus`` of the
        conditioned layer scale (reference ``mk/transformer.py:787-899``,
        the hook its conditional synthesis models plug into).
        ``normalize_skip_connections``: rescale ``x + f(x)`` back to
        ``|x|`` (reference ``:965-983``)."""
        d_ff = d_ff or 4 * d_model
        self.self_attn = MultiheadAttention(
            d_model, num_heads, dropout=dropout, use_rope=use_rope,
            num_kv_heads=num_kv_heads)
        self.ffn = _FFN(d_model, d_ff, dropout=dropout,
                        pre_activation=pre_activation)
        if cond_dim is not None:
            # the layer-scale head is only consumed by the PRE-norm
            # residual gating; post-norm would train dead parameters
            self.norm1 = CondLayerNorm(
                d_model, cond_dim, layer_scale=pre_norm,
                zero_init=zero_init)
            self.norm2 = CondLayerNorm(
                d_model, cond_dim, layer_scale=pre_norm,
                zero_init=zero_init)
        else:
            self.norm1 = _make_norm(norm, d_model)
            self.norm2 = _make_norm(norm, d_model)
        self.dropout = nn.Dropout(dropout) if dropout else None
        self.pre_norm = pre_norm
        self.normalize_skip_connections = normalize_skip_connections

    def _norm(self, norm, x, cond):
        if isinstance(norm, CondLayerNorm):
            return norm(x, cond)
        return norm(x), None

    def _residual(self, inputs, outputs, alpha=None):
        if alpha is not None:
            outputs = outputs * jax.nn.softplus(alpha)
        if not getattr(self, 'normalize_skip_connections', False):
            return inputs + outputs
        # norm-preserving skip: |result| == |inputs|
        ni = jnp.linalg.norm(inputs, axis=-1, keepdims=True)
        no = jnp.linalg.norm(outputs, axis=-1, keepdims=True)
        cross = jnp.sum(inputs * outputs, axis=-1, keepdims=True)
        scale = ni / jnp.sqrt(
            jnp.maximum(ni ** 2 + no ** 2 + 2 * cross, 1e-12))
        return scale * (inputs + outputs)

    def forward(self, x, seq_len=None, cond=None):
        def drop(h):
            return self.dropout(h) if self.dropout is not None else h

        if self.pre_norm:
            h, alpha = self._norm(self.norm1, x, cond)
            x = self._residual(
                x, drop(self.self_attn(h, key_padding_lens=seq_len)),
                alpha)
            h, alpha = self._norm(self.norm2, x, cond)
            x = self._residual(x, drop(self.ffn(h)), alpha)
        else:
            x = self._norm(
                self.norm1,
                self._residual(x, drop(self.self_attn(
                    x, key_padding_lens=seq_len))), cond)[0]
            x = self._norm(
                self.norm2, self._residual(x, drop(self.ffn(x))),
                cond)[0]
        return x


# Reference name (mk/transformer.py:787): the MLP+norm encoder
# micro-layer the reference builds its encoder from.
EncoderLayer = TransformerEncoderLayer


class TransformerEncoder(Module):
    """Reference parity: ``mk/modules/transformer.py:1127``.

    >>> from padertorch_tpu import random as ptrandom
    >>> ptrandom.seed(0)
    >>> import jax.numpy as jnp
    >>> enc = TransformerEncoder(d_model=32, num_layers=2, num_heads=4,
    ...                          input_size=16).eval()
    >>> enc(jnp.ones((2, 10, 16)), seq_len=[10, 7]).shape
    (2, 10, 32)
    """

    def __init__(self, d_model, num_layers, num_heads, d_ff=None,
                 dropout=0.0, use_rope=True, norm='layer_norm',
                 pre_norm=True, input_size=None, cond_dim=None,
                 normalize_skip_connections=False,
                 pre_activation=False, zero_init=False,
                 num_kv_heads=None):
        self.input_proj = (nn.Linear(input_size, d_model)
                           if input_size and input_size != d_model
                           else None)
        self.layers = [
            TransformerEncoderLayer(
                d_model, num_heads, d_ff=d_ff, dropout=dropout,
                use_rope=use_rope, norm=norm, pre_norm=pre_norm,
                cond_dim=cond_dim,
                normalize_skip_connections=normalize_skip_connections,
                pre_activation=pre_activation, zero_init=zero_init,
                num_kv_heads=num_kv_heads)
            for _ in range(num_layers)
        ]
        self.final_norm = _make_norm(norm, d_model) if pre_norm else None
        self.d_model = self.hidden_size = d_model

    def forward(self, x, seq_len=None, cond=None):
        if self.input_proj is not None:
            x = self.input_proj(x)
        for layer in self.layers:
            x = layer(x, seq_len=seq_len, cond=cond)
        if self.final_norm is not None:
            x = self.final_norm(x)
        if seq_len is not None:
            x = x * compute_mask(x, seq_len, 0, 1)
        return x


class TransformerDecoderLayer(Module):
    def __init__(self, d_model, num_heads, d_ff=None, dropout=0.0,
                 use_rope=True, norm='layer_norm', pre_norm=True,
                 d_memory=None, num_kv_heads=None,
                 self_attn_window=None):
        d_ff = d_ff or 4 * d_model
        # local (sliding-window) causal self-attention: each position
        # attends the previous `self_attn_window` tokens only — decode
        # then runs on an O(W) rolling cache instead of O(T_max)
        self.self_attn_window = self_attn_window
        self.self_attn = MultiheadAttention(
            d_model, num_heads, dropout=dropout, use_rope=use_rope,
            num_kv_heads=num_kv_heads)
        self.cross_attn = MultiheadAttention(
            d_model, num_heads, dropout=dropout, d_kv=d_memory,
            num_kv_heads=num_kv_heads)
        self.ffn = _FFN(d_model, d_ff, dropout=dropout)
        self.norm1 = _make_norm(norm, d_model)
        self.norm2 = _make_norm(norm, d_model)
        self.norm3 = _make_norm(norm, d_model)
        self.pre_norm = pre_norm
        self.dropout = nn.Dropout(dropout) if dropout else None

    def forward(self, x, memory, seq_len=None, memory_seq_len=None):
        def drop(h):
            return self.dropout(h) if self.dropout is not None else h

        win = (None if getattr(self, 'self_attn_window', None) is None
               else (self.self_attn_window, 0))
        if self.pre_norm:
            x = x + drop(self.self_attn(
                self.norm1(x), causal=True, attn_window=win))
            x = x + drop(self.cross_attn(
                self.norm2(x), memory, key_padding_lens=memory_seq_len))
            x = x + drop(self.ffn(self.norm3(x)))
        else:
            x = self.norm1(x + drop(self.self_attn(
                x, causal=True, attn_window=win)))
            x = self.norm2(x + drop(self.cross_attn(
                x, memory, key_padding_lens=memory_seq_len)))
            x = self.norm3(x + drop(self.ffn(x)))
        return x

    def decode_step(self, x, self_cache, cross_kv, index,
                    memory_seq_len=None):
        """One incremental step; mirrors :meth:`forward` with the
        self-attention KV cache and precomputed cross K/V."""
        step = (self.self_attn.decode_step_rolling
                if getattr(self, 'self_attn_window', None) is not None
                else self.self_attn.decode_step)
        if self.pre_norm:
            h, self_cache = step(self.norm1(x), self_cache, index)
            x = x + h
            x = x + self.cross_attn.attend_cached(
                self.norm2(x), cross_kv, key_padding_lens=memory_seq_len)
            x = x + self.ffn(self.norm3(x))
        else:
            h, self_cache = step(x, self_cache, index)
            x = self.norm1(x + h)
            x = self.norm2(x + self.cross_attn.attend_cached(
                x, cross_kv, key_padding_lens=memory_seq_len))
            x = self.norm3(x + self.ffn(x))
        return x, self_cache


class TransformerDecoder(Module):
    """Reference parity: ``mk/modules/transformer.py:1253``."""

    def __init__(self, d_model, num_layers, num_heads, d_ff=None,
                 dropout=0.0, use_rope=True, norm='layer_norm',
                 pre_norm=True, d_memory=None, num_kv_heads=None,
                 self_attn_window=None):
        self.self_attn_window = self_attn_window
        self.layers = [
            TransformerDecoderLayer(
                d_model, num_heads, d_ff=d_ff, dropout=dropout,
                use_rope=use_rope, norm=norm, pre_norm=pre_norm,
                d_memory=d_memory, num_kv_heads=num_kv_heads,
                self_attn_window=self_attn_window)
            for _ in range(num_layers)
        ]
        self.final_norm = _make_norm(norm, d_model) if pre_norm else None
        self.d_model = d_model

    def forward(self, x, memory, seq_len=None, memory_seq_len=None):
        for layer in self.layers:
            x = layer(x, memory, seq_len=seq_len,
                      memory_seq_len=memory_seq_len)
        if self.final_norm is not None:
            x = self.final_norm(x)
        return x

    def init_cache(self, memory, max_len, dtype=jnp.float32):
        """Build the decode cache: per-layer preallocated self-attention
        K/V plus the cross-attention K/V projected from ``memory``
        ONCE (they never change during generation).  The result is a
        pytree — it carries through ``lax.scan`` so a whole generation
        loop compiles to one XLA program.
        """
        batch_size = memory.shape[0]
        window = getattr(self, 'self_attn_window', None)
        if window is not None:
            # local attention: O(W) ring buffers instead of O(max_len)
            slots = min(window + 1, max_len)
            self_caches = [
                l.self_attn.init_rolling_cache(batch_size, slots, dtype)
                for l in self.layers]
        else:
            self_caches = [
                l.self_attn.init_cache(batch_size, max_len, dtype)
                for l in self.layers]
        return {
            'self': self_caches,
            'cross': [l.cross_attn.precompute_kv(memory)
                      for l in self.layers],
        }

    def decode_step(self, x, cache, index, memory_seq_len=None):
        """Incrementally decode tokens at ``[index, index + Tq)``.

        (B, Tq, d_model) in, (B, Tq, d_model) out, plus the updated
        cache.  ``index`` may be traced; with a fixed Tq the step jits
        once for all positions.  Chunked decode over a full sequence is
        exactly equal to one-shot :meth:`forward` (tested).
        """
        new_self = []
        for layer, sc, ck in zip(
                self.layers, cache['self'], cache['cross']):
            x, sc = layer.decode_step(
                x, sc, ck, index, memory_seq_len=memory_seq_len)
            new_self.append(sc)
        if self.final_norm is not None:
            x = self.final_norm(x)
        return x, {'self': new_self, 'cross': cache['cross']}


class PositionalConvEmbedding(Module):
    """Convolutional relative positional embedding (wav2vec2-style).

    Reference parity: ``mk/modules/transformer.py:151``.
    """

    def __init__(self, d_model, kernel_size=128, groups=16):
        self.conv = nn.Conv1d(
            d_model, d_model, kernel_size, padding=kernel_size // 2,
            groups=groups)
        self.kernel_size = kernel_size

    def forward(self, x):
        """x: (B, T, D) -> x + conv positional features."""
        h = jnp.swapaxes(x, 1, 2)
        h = self.conv(h)
        if self.kernel_size % 2 == 0:
            h = h[..., :-1]
        h = jax.nn.gelu(h)
        return x + jnp.swapaxes(h, 1, 2)


def interleave(x, y, axis):
    """Interleave ``x`` and ``y`` along ``axis`` (x0, y0, x1, y1, ...).

    Reference parity: ``mk/modules/transformer.py:28``.

    >>> interleave(jnp.array([[1., 2., 3.]]),
    ...            jnp.array([[4., 5., 6.]]), axis=1).tolist()
    [[1.0, 4.0, 2.0, 5.0, 3.0, 6.0]]
    """
    axis = axis % x.ndim
    shape = list(x.shape)
    shape[axis] *= 2
    return jnp.stack((x, y), axis=axis + 1).reshape(shape)


def positional_embedding(d_model: int, max_len: int = 5000):
    """Sinusoidal position table, shape ``(max_len, 1, d_model)``.

    Reference parity: ``mk/modules/transformer.py:47`` — note the
    reference uses ``max_len`` (not the Vaswani 10000) as the frequency
    base and ``d_model // 2`` as the exponent denominator; reproduced
    here.

    >>> pe = positional_embedding(8, max_len=16)
    >>> pe.shape
    (16, 1, 8)
    >>> bool(jnp.all(pe[0, 0, 0::2] == 0)), bool(jnp.all(pe[0, 0, 1::2] == 1))
    (True, True)
    """
    position = np.arange(max_len)[:, None]
    half = d_model // 2
    div_term = np.exp(np.arange(0, half) * (-math.log(float(max_len)) / half))
    pe = np.zeros((max_len, 1, d_model), dtype='float32')
    pe[:, 0, 0::2] = np.sin(position * div_term)
    pe[:, 0, 1::2] = np.cos(position * div_term)
    return jnp.asarray(pe)


class PositionalEncoding(Module):
    """Additive sinusoidal positional encoding with dropout.

    Reference parity: ``mk/modules/transformer.py:113``.

    >>> import padertorch_tpu as pt
    >>> pt.random.seed(0)
    >>> enc = PositionalEncoding(8, max_len=32).eval()
    >>> enc(jnp.zeros((2, 5, 8))).shape
    (2, 5, 8)
    """

    def __init__(self, d_model, dropout=0.0, max_len=5000,
                 batch_first=True):
        self.dropout = nn.Dropout(dropout) if dropout else None
        self.batch_first = batch_first
        pe = positional_embedding(d_model, max_len)
        if batch_first:
            pe = jnp.swapaxes(pe, 0, 1)
        self.register_buffer('pe', pe)

    def forward(self, x):
        """x: (B, T, D) if batch_first else (T, B, D)."""
        if self.batch_first:
            x = x + self.pe[:, :x.shape[1]]
        else:
            x = x + self.pe[:x.shape[0]]
        if self.dropout is not None:
            x = self.dropout(x)
        return x


class MPLinear(Module):
    """Linear layer with optional forced weight normalization
    (magnitude-preserving, Karras et al. 2024 Alg. 1).

    Reference parity: ``mk/modules/transformer.py:59`` — with
    ``magnitude_preserving=True`` the weight is kept on the unit sphere
    (the reference re-normalizes in-place each training step; here the
    normalization is applied functionally in the forward, its fixed
    point — gradients are projected identically) and the output is
    scaled by ``1/sqrt(in_features)``; with a bias, input and bias are
    halved and the result rescaled by ``sqrt(2)`` so activation
    magnitudes stay ~1.
    """

    def __init__(self, in_features, out_features, bias=True,
                 magnitude_preserving=False, chunks=None):
        self.magnitude_preserving = magnitude_preserving
        self.chunks = chunks
        self.in_features = in_features
        if magnitude_preserving:
            self.weight = jax.random.normal(
                ptrandom.init_key(), (out_features, in_features))
        else:  # xavier uniform, like the reference
            bound = math.sqrt(6.0 / (in_features + out_features))
            self.weight = jax.random.uniform(
                ptrandom.init_key(), (out_features, in_features),
                minval=-bound, maxval=bound)
        self.bias = jnp.zeros((out_features,)) if bias else None

    def forward(self, x):
        from padertorch_tpu.contrib.mk.modules.utils import normalize
        w, bias, scale = self.weight, self.bias, 1.0
        if self.magnitude_preserving:
            w = normalize(w, chunks=self.chunks) / math.sqrt(
                self.in_features)
            if bias is not None:
                bias = 0.5 * bias
                x = 0.5 * x
                scale = math.sqrt(2.0)
        y = x @ w.T
        if bias is not None:
            y = y + bias
        return y / scale


def set_attention_backend(module, use_flash=True):
    """Flip every attention block in a module tree to (or from) the
    fused Pallas attention backend (``ops/pallas/attention``).

    Any module exposing a ``use_flash`` attribute participates: this
    :class:`MultiheadAttention`, the je ``MultiHeadAttention``, and the
    stacks built from them (TransformerEncoder/Decoder, wav2vec2/WavLM,
    je TransformerLayerStack, ...).  Returns ``module``.
    """
    if hasattr(module, 'use_flash'):
        module.use_flash = use_flash
    for value in vars(module).values():
        if isinstance(value, Module):
            set_attention_backend(value, use_flash)
        elif isinstance(value, (list, tuple)):
            for item in value:
                if isinstance(item, Module):
                    set_attention_backend(item, use_flash)
        elif isinstance(value, dict):
            for item in value.values():
                if isinstance(item, Module):
                    set_attention_backend(item, use_flash)
    return module


def autoregressive_generate(
        decoder, memory, *, embed, logits_head, bos_id, max_len,
        memory_seq_len=None, eos_id=None, temperature=0.0, top_k=None,
        key=None):
    """Token generation with the KV-cache decoder as ONE ``lax.scan``.

    The whole loop — embed, :meth:`TransformerDecoder.decode_step`,
    head, sample, early-stop bookkeeping — compiles to a single XLA
    program (static ``max_len`` trip count; no host round-trips).

    Args:
        decoder: a :class:`TransformerDecoder` (or anything with
            ``init_cache``/``decode_step``).
        memory: (B, S, d_memory) encoder output.
        embed: callable (B,) int32 token ids -> (B, d_model).
        logits_head: callable (B, d_model) -> (B, vocab) logits.
        bos_id: start token fed at step 0.
        max_len: number of tokens to generate (static).
        eos_id: optional stop token; finished rows keep emitting it and
            their length is recorded.
        temperature: 0 -> greedy argmax; > 0 -> sampled from
            ``softmax(logits / temperature)`` (``key`` required).
        top_k: optional k; restrict sampling to the k best logits.
        key: PRNG key for sampling.

    Returns:
        ``(tokens, lengths)`` — (B, max_len) int32 and (B,) int32
        (generated length incl. the eos; ``max_len`` if never stopped).
    """
    sample = temperature and temperature > 0
    if sample and key is None:
        raise ValueError('temperature > 0 needs a PRNG key')
    if key is None:
        key = jax.random.PRNGKey(0)  # unused by greedy
    batch = memory.shape[0]
    # cache in the memory dtype: a bf16 serving model keeps bf16 caches
    cache = decoder.init_cache(memory, max_len, dtype=memory.dtype)
    token0 = jnp.full((batch,), bos_id, jnp.int32)
    done0 = jnp.zeros((batch,), bool)
    len0 = jnp.full((batch,), max_len, jnp.int32)

    def pick(logits, key):
        if top_k is not None:
            kth = jax.lax.top_k(logits, top_k)[0][..., -1:]
            logits = jnp.where(
                logits < kth, jnp.finfo(logits.dtype).min, logits)
        if sample:
            return jax.random.categorical(
                key, logits / jnp.asarray(temperature, logits.dtype))
        return jnp.argmax(logits, axis=-1)

    def step(carry, t):
        token, cache, done, lengths, key = carry
        x = embed(token)[:, None, :]                     # (B, 1, D)
        out, cache = decoder.decode_step(
            x, cache, t, memory_seq_len=memory_seq_len)
        key, sub = jax.random.split(key)
        nxt = pick(logits_head(out[:, 0]), sub).astype(jnp.int32)
        if eos_id is not None:
            nxt = jnp.where(done, eos_id, nxt)
            just_done = ~done & (nxt == eos_id)
            lengths = jnp.where(just_done, t + 1, lengths)
            done = done | just_done
        return (nxt, cache, done, lengths, key), nxt

    (_, _, _, lengths, _), tokens = jax.lax.scan(
        step, (token0, cache, done0, len0, key), jnp.arange(max_len))
    return jnp.transpose(tokens, (1, 0)), lengths


def beam_search_generate(
        decoder, memory, *, embed, logits_head, bos_id, max_len,
        beam_size, eos_id=None, memory_seq_len=None,
        length_penalty=0.0):
    """Beam search over the KV-cache decoder as ONE ``lax.scan``.

    Each step scores ``beam_size * vocab`` continuations per batch row,
    keeps the ``beam_size`` best, and REORDERS the self-attention cache
    by parent beam with a batched gather (cross-attention K/V are
    identical across a row's beams, so they are left untouched).
    Finished beams (emitted ``eos_id``) continue with exactly one
    zero-logprob ``eos`` continuation, freezing their score.

    Args:
        decoder: :class:`TransformerDecoder` (or same protocol).
        memory: (B, S, d_memory) encoder output.
        embed: (N,) int32 ids -> (N, d_model).
        logits_head: (N, d_model) -> (N, vocab).
        bos_id, max_len, eos_id: as in :func:`autoregressive_generate`.
        beam_size: beams kept per batch row.
        memory_seq_len: optional (B,) valid memory lengths.
        length_penalty: alpha >= 0; final ranking uses
            ``score / length**alpha`` (0 = pure log-prob).

    Returns:
        ``(tokens, scores, lengths)`` — (B, K, max_len) int32,
        (B, K) float32 cumulative log-probs and (B, K) int32 lengths,
        sorted best-first by the length-normalized score.
    """
    batch, k = memory.shape[0], beam_size
    mem = jnp.repeat(memory, k, axis=0)                  # (B*K, S, D)
    mlens = (None if memory_seq_len is None
             else jnp.repeat(jnp.asarray(memory_seq_len), k))
    cache = decoder.init_cache(mem, max_len, dtype=mem.dtype)
    tok0 = jnp.full((batch * k,), bos_id, jnp.int32)
    # only beam 0 is live at t=0 (all beams start identical)
    scores0 = jnp.tile(
        jnp.asarray([0.0] + [-jnp.inf] * (k - 1), jnp.float32),
        (batch, 1))
    done0 = jnp.zeros((batch, k), bool)
    len0 = jnp.full((batch, k), max_len, jnp.int32)
    hist0 = jnp.zeros((batch, k, max_len), jnp.int32)

    def step(carry, t):
        tok, cache, scores, done, lengths, hist = carry
        x = embed(tok)[:, None, :]
        out, cache = decoder.decode_step(
            x, cache, t, memory_seq_len=mlens)
        logp = jax.nn.log_softmax(
            logits_head(out[:, 0]).astype(jnp.float32), axis=-1)
        vocab = logp.shape[-1]
        logp = logp.reshape(batch, k, vocab)
        if eos_id is not None:
            # finished beams: single free eos continuation
            eos_row = jnp.full((vocab,), -jnp.inf
                               ).at[eos_id].set(0.0)
            logp = jnp.where(done[..., None], eos_row, logp)
        cand = (scores[..., None] + logp).reshape(batch, k * vocab)
        scores, idx = jax.lax.top_k(cand, k)             # (B, K)
        parent = idx // vocab
        token = (idx % vocab).astype(jnp.int32)

        def regather(a):                                  # (B, K, ...)
            return jnp.take_along_axis(
                a, parent.reshape(parent.shape + (1,) * (a.ndim - 2)),
                axis=1)

        done = regather(done)
        lengths = regather(lengths)
        hist = regather(hist)
        hist = jax.lax.dynamic_update_slice_in_dim(
            hist, token[..., None], t, axis=2)
        if eos_id is not None:
            just_done = ~done & (token == eos_id)
            lengths = jnp.where(just_done, t + 1, lengths)
            done = done | just_done
        # reorder the self-attention caches by parent beam
        flat = (jnp.arange(batch)[:, None] * k + parent).reshape(-1)
        self_cache = jax.tree_util.tree_map(
            lambda a: jnp.take(a, flat, axis=0), cache['self'])
        cache = {'self': self_cache, 'cross': cache['cross']}
        return (token.reshape(batch * k), cache, scores, done,
                lengths, hist), None

    (tok, cache, scores, done, lengths, hist), _ = jax.lax.scan(
        step, (tok0, cache, scores0, done0, len0, hist0),
        jnp.arange(max_len))
    if length_penalty:
        norm = scores / jnp.maximum(
            lengths.astype(jnp.float32), 1.0) ** length_penalty
    else:
        norm = scores
    order = jnp.argsort(-norm, axis=1)
    return (jnp.take_along_axis(hist, order[..., None], 1),
            jnp.take_along_axis(scores, order, 1),
            jnp.take_along_axis(lengths, order, 1))


def speculative_generate(
        decoder, draft_decoder, memory, *, embed, logits_head,
        draft_embed, draft_logits_head, bos_id, max_len,
        num_draft=4, memory_seq_len=None, draft_memory=None):
    """Greedy speculative decoding: EXACTLY the target decoder's greedy
    output, produced faster when a cheap draft agrees with it.

    Each round the draft decoder proposes ``num_draft`` tokens one by
    one; the target then scores all of them in ONE ``Tq = num_draft +
    1`` KV-cache decode (a single MXU-friendly batched step instead of
    ``num_draft`` sequential ones) and the longest agreeing prefix plus
    one correction token is accepted.  Acceptance is truncated to the
    batch minimum so the decode position stays a scalar — still exact,
    because an accepted draft token IS the target's greedy choice.

    Cache rollback is free by construction: a KV slot beyond the
    accepted position is causally masked for every query row until the
    loop has advanced past it — and by then it has been overwritten —
    so rejected speculative writes are never visible.

    Args:
        decoder / draft_decoder: target and draft
            :class:`TransformerDecoder` (or same protocol).
        embed / logits_head, draft_embed / draft_logits_head: the two
            models' token embeddings and output heads.
        draft_memory: the draft's encoder memory if it differs from the
            target's (defaults to ``memory``).
        num_draft: draft tokens proposed per verification step.

    Note: decoders with ``self_attn_window`` (rolling caches) are not
    supported — verification needs multi-token decode steps, which the
    one-token ring buffer rejects.

    Returns:
        (B, max_len) int32 tokens — bit-identical to
        ``autoregressive_generate(decoder, ..., temperature=0,
        eos_id=None)`` (tested).
    """
    k = num_draft
    batch = memory.shape[0]
    if draft_memory is None:
        draft_memory = memory
    budget = max_len + k + 1
    t_cache = decoder.init_cache(memory, budget, dtype=memory.dtype)
    d_cache = draft_decoder.init_cache(
        draft_memory, budget, dtype=draft_memory.dtype)
    tokens0 = jnp.zeros((batch, budget), jnp.int32)
    last0 = jnp.full((batch,), bos_id, jnp.int32)

    def round_(carry):
        t, tokens, last, t_cache, d_cache = carry

        # 1. draft k tokens sequentially (the cheap model)
        def draft_step(carry, i):
            tok, cache = carry
            out, cache = draft_decoder.decode_step(
                draft_embed(tok)[:, None], cache, t + i,
                memory_seq_len=memory_seq_len)
            nxt = jnp.argmax(
                draft_logits_head(out[:, 0]), axis=-1).astype(jnp.int32)
            return (nxt, cache), nxt

        (_, d_cache), drafts = jax.lax.scan(
            draft_step, (last, d_cache), jnp.arange(k))
        drafts = jnp.transpose(drafts, (1, 0))        # (B, k)

        # 2. target verifies all k+1 positions in ONE decode
        inputs = jnp.concatenate([last[:, None], drafts], axis=1)
        x = jax.vmap(embed)(inputs)                   # (B, k+1, D)
        out, t_cache = decoder.decode_step(
            x, t_cache, t, memory_seq_len=memory_seq_len)
        greedy = jnp.argmax(
            logits_head(out.reshape(batch * (k + 1), -1)),
            axis=-1).astype(jnp.int32).reshape(batch, k + 1)

        # 3. batch-min acceptance: longest prefix where draft == target
        agree = jnp.cumprod(
            (drafts == greedy[:, :k]).astype(jnp.int32), axis=1)
        accept = jnp.min(jnp.sum(agree, axis=1))      # scalar
        # write the target's choices for positions t..t+k; rows past
        # accept get overwritten by later rounds
        tokens = jax.lax.dynamic_update_slice(tokens, greedy, (0, t))
        last = jax.lax.dynamic_slice(
            greedy, (0, accept), (batch, 1))[:, 0]
        return t + accept + 1, tokens, last, t_cache, d_cache

    def cond(carry):
        return carry[0] < max_len

    _, tokens, _, _, _ = jax.lax.while_loop(
        cond, round_, (jnp.asarray(0), tokens0, last0, t_cache, d_cache))
    return tokens[:, :max_len]
