"""Native JAX WavLM: wav2vec2 trunk + gated relative position bias.

Reference parity: ``padertorch/contrib/mk/modules/features/ssl/
wavlm.py`` delegates to pretrained torchaudio/HF WavLM pipelines; here
the architecture itself is in-repo JAX so WavLM feature extraction jits
into the TPU graph (frozen or finetuned) like the native wav2vec2.
Oracle semantics follow HF ``modeling_wavlm.py`` (``WavLMAttention``):

- layer 0 owns a bucketed relative-position embedding table
  (``num_buckets`` x ``num_heads``; T5-style log-spaced buckets up to
  ``max_bucket_distance``) and computes one shared (H, T, T) bias;
- every layer gates that shared bias with its own query-dependent
  scalar gate: ``sigmoid(Linear(head_dim->8)(x).view(..., 2, 4)
  .sum(-1))`` -> ``gate_a * (gate_b * const - 1) + 2``.

TPU notes: the bucket index matrix depends only on the (static) frame
count, so it is computed host-side in numpy and baked into the graph
as a constant gather of the learnable embedding table; the gated bias
enters attention as one additive (B, H, T, T) logits term — no
dynamic shapes, MXU-friendly.
"""
import numpy as np
import jax
import jax.numpy as jnp

from padertorch_tpu import nn
from padertorch_tpu.base import Module
from padertorch_tpu.ops.sequence.mask import compute_mask
from padertorch_tpu.contrib.mk.modules.transformer import (
    MultiheadAttention,
)
from padertorch_tpu.contrib.mk.modules.features.wav2vec2 import (
    Wav2Vec2Model, _FeedForward, _PosConvEmbed, _hf_config_to_kwargs,
    _load_w2v2_body, _t, _linear,
)

__all__ = ['WavLMModel', 'WavLMEncoder', 'WavLMSelfAttention',
           'relative_positions_bucket', 'load_hf_wavlm']


def relative_positions_bucket(length, num_buckets=320, max_distance=800):
    """T5-style signed log-bucketed relative positions as a static
    (length, length) int index matrix (HF ``modeling_wavlm.py``
    ``_relative_positions_bucket``; bidirectional).

    >>> relative_positions_bucket(4, num_buckets=8, max_distance=16)
    array([[0, 5, 6, 6],
           [1, 0, 5, 6],
           [2, 1, 0, 5],
           [2, 2, 1, 0]])
    """
    context = np.arange(length, dtype=np.int64)[:, None]
    memory = np.arange(length, dtype=np.int64)[None, :]
    relative = memory - context
    num_buckets //= 2
    buckets = (relative > 0).astype(np.int64) * num_buckets
    relative = np.abs(relative)
    max_exact = num_buckets // 2
    is_small = relative < max_exact
    # clamp to >=1 inside the log: those entries are overridden by the
    # is_small branch below, the clamp just avoids log(0) warnings
    if_large = np.log(np.maximum(relative, 1).astype(np.float64)
                      / max_exact)
    if_large = if_large / np.log(max_distance / max_exact)
    if_large = (max_exact + if_large * (num_buckets - max_exact))
    if_large = np.minimum(
        if_large.astype(np.int64), num_buckets - 1)
    buckets += np.where(is_small, relative, if_large)
    return buckets


class WavLMSelfAttention(Module):
    """Self-attention with WavLM's gated relative position bias.

    Reuses :class:`MultiheadAttention` (q/k/v/out projections, padding
    masks) and feeds the gated bias through its ``attn_bias`` hook.
    Layer 0 (``has_relative_position_bias=True``) owns the bucketed
    embedding table and computes the shared ungated bias.
    """

    def __init__(self, d_model, num_heads, dropout=0.0,
                 num_buckets=320, max_distance=800,
                 has_relative_position_bias=False):
        self.mha = MultiheadAttention(d_model, num_heads,
                                      dropout=dropout)
        self.num_heads = num_heads
        self.head_dim = d_model // num_heads
        self.num_buckets = num_buckets
        self.max_distance = max_distance
        self.gru_rel_pos_const = jnp.ones((1, num_heads, 1, 1))
        self.gru_rel_pos_linear = nn.Linear(self.head_dim, 8)
        if has_relative_position_bias:
            # (num_buckets, num_heads) learnable embedding table
            self.rel_attn_embed = 0.02 * jnp.asarray(
                np.random.default_rng(0).standard_normal(
                    (num_buckets, num_heads), dtype=np.float32))
        else:
            self.rel_attn_embed = None

    # MultiheadAttention projection access for the checkpoint importer
    @property
    def q_proj(self):
        return self.mha.q_proj

    @property
    def k_proj(self):
        return self.mha.k_proj

    @property
    def v_proj(self):
        return self.mha.v_proj

    @property
    def out_proj(self):
        return self.mha.out_proj

    def compute_bias(self, length):
        """Shared ungated (H, T, T) relative position bias."""
        buckets = relative_positions_bucket(
            length, self.num_buckets, self.max_distance)
        values = self.rel_attn_embed[buckets]  # (T, T, H), const gather
        return jnp.transpose(values, (2, 0, 1))

    def forward(self, x, seq_len=None, position_bias=None):
        b, t, _ = x.shape
        if position_bias is None:
            position_bias = self.compute_bias(t)
        # query-dependent gate (HF WavLMAttention.forward steps 1-4)
        h = jnp.transpose(
            x.reshape(b, t, self.num_heads, self.head_dim),
            (0, 2, 1, 3))                              # (B, H, T, hd)
        proj = self.gru_rel_pos_linear(h)              # (B, H, T, 8)
        proj = proj.reshape(*proj.shape[:-1], 2, 4).sum(-1)
        sig = jax.nn.sigmoid(proj)                     # (B, H, T, 2)
        gate_a, gate_b = sig[..., 0:1], sig[..., 1:2]
        gate = gate_a * (gate_b * self.gru_rel_pos_const - 1.0) + 2.0
        gated_bias = gate * position_bias[None]        # (B, H, T, T)
        out = self.mha(x, key_padding_lens=seq_len, attn_bias=gated_bias)
        return out, position_bias


class _WavLMEncoderLayer(Module):
    """Post-norm (base) / pre-norm "stable" (large) WavLM layer —
    identical residual topology to wav2vec2, WavLM attention inside."""

    def __init__(self, d_model, num_heads, d_ff, dropout=0.0,
                 stable_layer_norm=False, layer_norm_eps=1e-5,
                 num_buckets=320, max_distance=800,
                 has_relative_position_bias=False):
        self.attention = WavLMSelfAttention(
            d_model, num_heads, dropout=dropout,
            num_buckets=num_buckets, max_distance=max_distance,
            has_relative_position_bias=has_relative_position_bias)
        self.layer_norm = nn.LayerNorm(d_model, eps=layer_norm_eps)
        self.feed_forward = _FeedForward(d_model, d_ff, dropout=dropout)
        self.final_layer_norm = nn.LayerNorm(d_model, eps=layer_norm_eps)
        self.dropout = nn.Dropout(dropout) if dropout else None
        self.stable_layer_norm = stable_layer_norm

    def forward(self, x, seq_len=None, position_bias=None):
        def drop(h):
            return self.dropout(h) if self.dropout is not None else h

        if self.stable_layer_norm:
            attn, position_bias = self.attention(
                self.layer_norm(x), seq_len=seq_len,
                position_bias=position_bias)
            x = x + drop(attn)
            x = x + self.feed_forward(self.final_layer_norm(x))
        else:
            attn, position_bias = self.attention(
                x, seq_len=seq_len, position_bias=position_bias)
            x = self.layer_norm(x + drop(attn))
            x = self.final_layer_norm(x + self.feed_forward(x))
        return x, position_bias


class WavLMEncoder(Module):
    """WavLM transformer encoder; same pos-conv front as wav2vec2,
    position bias computed once by layer 0 and shared down the stack."""

    def __init__(self, d_model, num_layers, num_heads, d_ff,
                 dropout=0.0, stable_layer_norm=False,
                 num_conv_pos_embeddings=128,
                 num_conv_pos_embedding_groups=16, layer_norm_eps=1e-5,
                 num_buckets=320, max_distance=800):
        self.pos_conv_embed = _PosConvEmbed(
            d_model, num_conv_pos_embeddings,
            num_conv_pos_embedding_groups)
        self.layer_norm = nn.LayerNorm(d_model, eps=layer_norm_eps)
        self.dropout = nn.Dropout(dropout) if dropout else None
        self.layers = [
            _WavLMEncoderLayer(
                d_model, num_heads, d_ff, dropout=dropout,
                stable_layer_norm=stable_layer_norm,
                layer_norm_eps=layer_norm_eps,
                num_buckets=num_buckets, max_distance=max_distance,
                has_relative_position_bias=(i == 0))
            for i in range(num_layers)
        ]
        self.stable_layer_norm = stable_layer_norm

    def forward(self, x, seq_len=None, output_hidden_states=False):
        if seq_len is not None:
            x = x * compute_mask(x, seq_len, 0, 1)
        x = x + self.pos_conv_embed(x)
        if not self.stable_layer_norm:
            x = self.layer_norm(x)
        if self.dropout is not None:
            x = self.dropout(x)
        position_bias = None
        hidden_states = [x]
        for layer in self.layers:
            x, position_bias = layer(
                x, seq_len=seq_len, position_bias=position_bias)
            hidden_states.append(x)
        if self.stable_layer_norm:
            x = self.layer_norm(x)
            hidden_states[-1] = x
        if output_hidden_states:
            return x, hidden_states
        return x


class WavLMModel(Wav2Vec2Model):
    """WavLM feature extractor, fully in-repo JAX.

    Same forward/padding/length API as :class:`Wav2Vec2Model`; the
    encoder uses WavLM's gated relative position bias attention.

    >>> from padertorch_tpu import random as ptrandom
    >>> ptrandom.seed(0)
    >>> m = WavLMModel(
    ...     conv_dim=(8, 8), conv_kernel=(10, 3), conv_stride=(5, 2),
    ...     d_model=16, num_layers=2, num_heads=2, d_ff=32,
    ...     num_buckets=32, max_bucket_distance=64).eval()
    >>> import jax.numpy as jnp
    >>> x, seq_len = m(jnp.zeros((2, 400)), sequence_lengths=[400, 350])
    >>> x.shape
    (2, 39, 16)
    >>> [int(n) for n in seq_len]
    [39, 34]
    """

    def __init__(self, *, num_buckets=320, max_bucket_distance=800,
                 **kwargs):
        assert kwargs.get('attention_type', 'default') == 'default', (
            'WavLM defines its own (gated relative position bias) '
            'attention')
        super().__init__(**kwargs)
        enc = self.encoder  # rebuild with the WavLM encoder
        self.encoder = WavLMEncoder(
            self.d_model, self.num_layers,
            num_heads=enc.num_heads,
            d_ff=enc.layers[0].feed_forward.intermediate_dense
                .weight.shape[1],
            dropout=kwargs.get('dropout', 0.0),
            stable_layer_norm=enc.stable_layer_norm,
            num_conv_pos_embeddings=enc.pos_conv_embed.kernel_size,
            num_conv_pos_embedding_groups=(
                enc.pos_conv_embed.conv.groups),
            layer_norm_eps=kwargs.get('layer_norm_eps', 1e-5),
            num_buckets=num_buckets, max_distance=max_bucket_distance)


def load_hf_wavlm(model_path_or_sd, config=None, layer=-1):
    """Build a :class:`WavLMModel` from a HuggingFace torch
    ``WavLMModel`` checkpoint (local directory or an already-loaded
    ``state_dict`` plus config dict); torch/transformers are used for
    deserialization only — the returned model is pure JAX."""
    if isinstance(model_path_or_sd, dict):
        sd = {k: np.asarray(v) for k, v in model_path_or_sd.items()}
        assert config is not None
        cfg = dict(config)
    else:
        from transformers import WavLMModel as HFModel
        hf = HFModel.from_pretrained(str(model_path_or_sd))
        sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
        cfg = _hf_config_to_kwargs(hf.config)
        cfg['num_buckets'] = hf.config.num_buckets
        cfg['max_bucket_distance'] = hf.config.max_bucket_distance
    model = WavLMModel(**cfg, layer=layer)
    _load_w2v2_body(model, sd)
    for i, lyr in enumerate(model.encoder.layers):
        p = f'encoder.layers.{i}.attention'
        att = lyr.attention
        att.gru_rel_pos_const = _t(sd, f'{p}.gru_rel_pos_const')
        _linear(att.gru_rel_pos_linear, sd, f'{p}.gru_rel_pos_linear')
        if att.rel_attn_embed is not None:
            att.rel_attn_embed = _t(sd, f'{p}.rel_attn_embed.weight')
    return model.eval()
