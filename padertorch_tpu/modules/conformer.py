"""Conformer encoder (Gulati et al., Interspeech 2020).

Beyond-reference component (padertorch ships no conformer): the
standard speech encoder — macaron feed-forward sandwich, multi-head
self-attention with relative positions, and a gated depthwise
convolution module — built from this framework's primitives:

- attention is :class:`padertorch_tpu.contrib.mk.modules.transformer.
  MultiheadAttention` (RoPE relative positions; rides the fused Pallas
  attention kernel via ``set_attention_backend``, and supports
  sliding-window attention through ``attn_window`` for streaming /
  long-form audio);
- the convolution-module norm is the framework's sequence-masked
  :class:`padertorch_tpu.modules.normalization.Normalization`
  (masked batch norm, the conformer default) or a LayerNorm;
- padded frames are zeroed before the depthwise conv, so padding
  never leaks into valid frames and outputs are padding-invariant.

Layout is (B, T, C) throughout (TPU-friendly: the pointwise convs are
plain GEMMs on the MXU; only the small depthwise conv runs as a
grouped convolution).
"""
import jax
import jax.numpy as jnp

from padertorch_tpu.module import Module
from padertorch_tpu import nn
from padertorch_tpu.modules.normalization import Normalization
from padertorch_tpu.ops.sequence import compute_mask
from padertorch_tpu.contrib.mk.modules.transformer import (
    MultiheadAttention,
)

__all__ = ['ConformerBlock', 'ConformerConvModule', 'ConformerEncoder']


class _HalfStepFFN(Module):
    """Macaron feed-forward: pre-LN -> expand -> SiLU -> project, added
    with weight 1/2 (Gulati et al. eq. 1/4)."""

    def __init__(self, d_model, d_ff, dropout=0.0):
        self.norm = nn.LayerNorm((d_model,))
        self.linear1 = nn.Linear(d_model, d_ff)
        self.linear2 = nn.Linear(d_ff, d_model)
        self.dropout = nn.Dropout(dropout) if dropout else None

    def forward(self, x):
        h = self.norm(x)
        h = jax.nn.silu(self.linear1(h))
        if self.dropout is not None:
            h = self.dropout(h)
        h = self.linear2(h)
        if self.dropout is not None:
            h = self.dropout(h)
        return h


class ConformerConvModule(Module):
    """Pre-LN -> pointwise (2x, GLU) -> depthwise -> norm -> SiLU ->
    pointwise -> dropout (Gulati et al. Fig. 2).

    ``norm='batch_norm'`` uses the framework's sequence-masked batch
    normalization (statistics over batch+time of valid frames only);
    ``'layer_norm'`` is the mask-free alternative.  ``causal=True``
    left-pads the depthwise conv (streaming encoders).
    """

    def __init__(self, d_model, kernel_size=31, norm='batch_norm',
                 dropout=0.0, causal=False):
        assert kernel_size % 2 == 1 or causal, kernel_size
        self.d_model = d_model
        self.norm_in = nn.LayerNorm((d_model,))
        self.pointwise1 = nn.Conv1d(d_model, 2 * d_model, 1)
        self.depthwise = nn.Conv1d(
            d_model, d_model, kernel_size, groups=d_model, padding=0)
        self.kernel_size = kernel_size
        self.causal = causal
        if norm == 'batch_norm':
            self.norm_conv = Normalization(
                data_format='bct', shape=(None, d_model, None),
                statistics_axis='bt', independent_axis='c')
        elif norm == 'layer_norm':
            # channel LayerNorm applied in (B, T, C)
            self.norm_conv = nn.LayerNorm((d_model,))
        else:
            raise ValueError(f'Unknown conv norm: {norm!r}')
        self.norm_kind = norm
        self.pointwise2 = nn.Conv1d(d_model, d_model, 1)
        self.dropout = nn.Dropout(dropout) if dropout else None

    def forward(self, x, seq_len=None):
        """(B, T, C) -> (B, T, C)."""
        h = self.norm_in(x)
        h = jnp.swapaxes(h, 1, 2)  # (B, C, T)
        h = self.pointwise1(h)
        a, b = jnp.split(h, 2, axis=1)
        h = a * jax.nn.sigmoid(b)  # GLU over channels
        if seq_len is not None:
            # padded frames must not leak into valid ones through the
            # depthwise conv's receptive field; the pointwise bias makes
            # them nonzero, so mask right before the depthwise conv
            h = h * compute_mask(h, seq_len, 0, 2)
        if self.causal:
            h = jnp.pad(h, ((0, 0), (0, 0), (self.kernel_size - 1, 0)))
        else:
            half = (self.kernel_size - 1) // 2
            h = jnp.pad(h, ((0, 0), (0, 0), (half, half)))
        h = self.depthwise(h)
        if self.norm_kind == 'batch_norm':
            h = self.norm_conv(h, sequence_lengths=seq_len)
        else:
            h = jnp.swapaxes(
                self.norm_conv(jnp.swapaxes(h, 1, 2)), 1, 2)
        h = jax.nn.silu(h)
        h = self.pointwise2(h)
        h = jnp.swapaxes(h, 1, 2)  # (B, T, C)
        if self.dropout is not None:
            h = self.dropout(h)
        return h

    # ---- carried-state streaming (serving) --------------------------
    def init_stream_state(self, batch_size, dtype=jnp.float32):
        """Carried left context of the depthwise conv: the last
        ``kernel_size - 1`` frames of the GLU output.  Zero-init
        reproduces the causal left padding exactly."""
        assert self.causal, 'streaming requires the causal conv module'
        return jnp.zeros(
            (batch_size, self.d_model, self.kernel_size - 1), dtype)

    def stream_step(self, x, state):
        """Process one chunk with carried conv state; in eval mode the
        batch norm applies running statistics (stateless per frame), so
        chunked output == the causal one-shot forward (tested)."""
        h = self.norm_in(x)
        h = jnp.swapaxes(h, 1, 2)  # (B, C, T)
        h = self.pointwise1(h)
        a, b = jnp.split(h, 2, axis=1)
        h = a * jax.nn.sigmoid(b)
        h_cat = jnp.concatenate([state, h], axis=-1)
        new_state = h_cat[..., -(self.kernel_size - 1):]
        h = self.depthwise(h_cat)
        if self.norm_kind == 'batch_norm':
            h = self.norm_conv(h, sequence_lengths=None)
        else:
            h = jnp.swapaxes(
                self.norm_conv(jnp.swapaxes(h, 1, 2)), 1, 2)
        h = jax.nn.silu(h)
        h = self.pointwise2(h)
        h = jnp.swapaxes(h, 1, 2)
        if self.dropout is not None:
            h = self.dropout(h)
        return h, new_state


class ConformerBlock(Module):
    """FFN/2 -> MHSA -> conv module -> FFN/2 -> LN (Gulati et al. eq. 1-5).

    ``attn_window``: optional ``(left, right)`` sliding-window
    attention for streaming / long-form inputs (composes with the
    fused attention backend's pruned-band kernel).
    """

    def __init__(self, d_model, num_heads, d_ff=None, kernel_size=31,
                 dropout=0.0, conv_norm='batch_norm', causal=False,
                 attn_window=None, use_rope=True):
        d_ff = d_ff or 4 * d_model
        self.ffn1 = _HalfStepFFN(d_model, d_ff, dropout)
        self.attn_norm = nn.LayerNorm((d_model,))
        self.self_attn = MultiheadAttention(
            d_model, num_heads, dropout=dropout, use_rope=use_rope)
        self.conv = ConformerConvModule(
            d_model, kernel_size=kernel_size, norm=conv_norm,
            dropout=dropout, causal=causal)
        self.ffn2 = _HalfStepFFN(d_model, d_ff, dropout)
        self.final_norm = nn.LayerNorm((d_model,))
        self.dropout = nn.Dropout(dropout) if dropout else None
        self.causal = causal
        self.attn_window = attn_window

    def forward(self, x, seq_len=None):
        def drop(h):
            return self.dropout(h) if self.dropout is not None else h

        x = x + 0.5 * self.ffn1(x)
        h = self.attn_norm(x)
        h = self.self_attn(
            h, key_padding_lens=seq_len, causal=self.causal,
            attn_window=self.attn_window)
        x = x + drop(h)
        x = x + self.conv(x, seq_len=seq_len)
        x = x + 0.5 * self.ffn2(x)
        return self.final_norm(x)

    # ---- carried-state streaming (serving) --------------------------
    def init_stream_state(self, batch_size, max_len, dtype=jnp.float32):
        """Per-block streaming state: the self-attention K/V cache
        (preallocated to ``max_len``, updated at a traced position — the
        same serving machinery as the transformer decoder) plus the conv
        module's carried left context."""
        assert self.causal, 'streaming requires a causal block'
        assert self.attn_window is None, (
            'chunked streaming with sliding-window attention is not '
            'wired up; use the full causal cache')
        return {
            'attn': self.self_attn.init_cache(batch_size, max_len, dtype),
            'conv': self.conv.init_stream_state(batch_size, dtype),
        }

    def stream_step(self, x, state, index):
        """One chunk at absolute positions ``[index, index + Tc)``.

        Cost is O(chunk) per call (the attention reads the cache, the
        conv reads ``kernel_size - 1`` carried frames) — no prefix
        recompute.  Equal to the causal one-shot :meth:`forward` on the
        concatenated chunks (tested)."""
        x = x + 0.5 * self.ffn1(x)
        h = self.attn_norm(x)
        h, attn_state = self.self_attn.decode_step(
            h, state['attn'], index)
        x = x + h
        h, conv_state = self.conv.stream_step(x, state['conv'])
        x = x + h
        x = x + 0.5 * self.ffn2(x)
        return self.final_norm(x), {'attn': attn_state,
                                    'conv': conv_state}


class ConformerEncoder(Module):
    """Stack of conformer blocks with an optional input projection.

    >>> from padertorch_tpu import random as ptrandom
    >>> ptrandom.seed(0)
    >>> import jax.numpy as jnp
    >>> enc = ConformerEncoder(d_model=32, num_layers=2, num_heads=4,
    ...                        input_size=16, kernel_size=7).eval()
    >>> enc(jnp.ones((2, 20, 16)), seq_len=[20, 15]).shape
    (2, 20, 32)
    """

    def __init__(self, d_model, num_layers, num_heads, d_ff=None,
                 kernel_size=31, dropout=0.0, conv_norm='batch_norm',
                 causal=False, attn_window=None, use_rope=True,
                 input_size=None):
        self.input_proj = (nn.Linear(input_size, d_model)
                           if input_size and input_size != d_model
                           else None)
        self.layers = [
            ConformerBlock(
                d_model, num_heads, d_ff=d_ff, kernel_size=kernel_size,
                dropout=dropout, conv_norm=conv_norm, causal=causal,
                attn_window=attn_window, use_rope=use_rope)
            for _ in range(num_layers)
        ]
        self.d_model = self.hidden_size = d_model

    def forward(self, x, seq_len=None):
        """(B, T, F) -> (B, T, d_model)."""
        if self.input_proj is not None:
            x = self.input_proj(x)
        for layer in self.layers:
            x = layer(x, seq_len=seq_len)
        if seq_len is not None:
            x = x * compute_mask(x, seq_len, 0, 1)
        return x

    # ---- carried-state streaming (serving) --------------------------
    def init_stream_state(self, batch_size, max_len, dtype=jnp.float32):
        """State pytree for :meth:`stream_step` (max ``max_len`` total
        frames across all chunks)."""
        return [layer.init_stream_state(batch_size, max_len, dtype)
                for layer in self.layers]

    def stream_step(self, x, state, index):
        """Encode one chunk at absolute positions ``[index, index+Tc)``.

        The state is a pytree of static-shape arrays, so the whole
        online loop can live in ``lax.scan`` — or one jitted program per
        chunk size from the host.  Chunked == one-shot causal forward
        (tested, ``tests/test_modules/test_conformer_streaming.py``).
        """
        if self.input_proj is not None:
            x = self.input_proj(x)
        new_state = []
        for layer, s in zip(self.layers, state):
            x, s = layer.stream_step(x, s, index)
            new_state.append(s)
        return x, new_state
