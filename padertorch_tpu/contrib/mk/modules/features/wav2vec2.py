"""Native JAX wav2vec 2.0: conv feature encoder + transformer encoder.

Reference parity:
``padertorch/contrib/mk/modules/features/ssl/wav2vec2/_wav2vec2.py``
(the self-contained torch port wrapping torchaudio/HF graphs — padding
arithmetic :292, output lengths :352, layer extraction :423, forward
:478) and ``.../wav2vec2/components.py`` (attention variants: ALiBi
:90, RoPE :167, KERPLE-log :223, Longformer :318).

Here the **entire model graph is in-repo JAX** — nothing delegates to
``transformers``/``torchaudio`` at runtime, so the extractor jits into
the training step like any other module (frozen or finetuned).  The HF
*checkpoint* import path stays: :func:`load_hf_wav2vec2` converts a
torch ``Wav2Vec2Model`` state dict (torch used only for
deserialization; no network access with a local checkpoint).

TPU notes: the conv encoder is 7 large strided convs (MXU); attention
is the fused softmax(QK^T)V chain from
:class:`~padertorch_tpu.contrib.mk.modules.transformer
.MultiheadAttention`; position-variant biases (ALiBi & co.) enter as
one additive (H, T, T) array — static shapes, no gather/scatter.
"""
import math
import typing as tp

import numpy as np
import jax
import jax.numpy as jnp

from padertorch_tpu import nn
from padertorch_tpu.base import Module
from padertorch_tpu.ops.sequence.mask import compute_mask
from padertorch_tpu.contrib.mk.modules.transformer import (
    MultiheadAttention,
)

__all__ = [
    'ConvFeatureEncoder', 'FeatureProjection', 'Wav2Vec2Encoder',
    'Wav2Vec2Model', 'load_hf_wav2vec2', 'load_hf_hubert',
    'alibi_bias', 'kerple_log_bias', 'longformer_bias',
    'ALiBi', 'RoPEAttention', 'KerpleLogAttention',
    'LongformerAttention',
]


def _gelu(x):
    # exact (erf) GELU — what torch nn.GELU computes; the tanh
    # approximation differs by ~1e-3 and breaks checkpoint parity
    return jax.nn.gelu(x, approximate=False)


# ---- attention variants (ref components.py) ---------------------------

def alibi_bias(num_heads, length, dtype=jnp.float32):
    """ALiBi additive logits bias (ref ``components.py:90``):
    ``-|m - n|`` scaled per head by ``linspace(8/H, 8, H)``.
    Returns (1, H, T, T)."""
    idx = jnp.arange(length)
    dist = -jnp.abs(idx[None, :] - idx[:, None]).astype(dtype)
    slopes = jnp.linspace(8.0 / num_heads, 8.0, num_heads).astype(dtype)
    return (dist[None] * slopes[:, None, None])[None]


def kerple_log_bias(bias_p, bias_a, length, eps=1e-2):
    """KERPLE log-kernel bias ``-p * log(1 + a * tril(|m-n|))``
    (ref ``components.py:253``). ``bias_p/bias_a``: (H, 1, 1) learnable.
    Returns (1, H, T, T)."""
    idx = jnp.arange(length)
    diff = jnp.tril(
        (idx[:, None] - idx[None, :]).astype(jnp.float32))
    p = jnp.clip(bias_p, eps, None)
    a = jnp.clip(bias_a, eps, None)
    return (-p * jnp.log1p(a * diff[None]))[None]


def longformer_bias(window_size, length, dtype=jnp.float32):
    """Banded local-attention mask as additive -inf bias
    (ref ``components.py:346``): positions farther than the window are
    excluded. Returns (1, 1, T, T)."""
    idx = jnp.arange(length)
    diff = idx[None, :] - idx[:, None]
    inside = ((diff <= window_size // 2)
              & (diff >= -math.ceil(window_size / 2) + 1))
    bias = jnp.where(inside, 0.0, jnp.finfo(dtype).min)
    return bias[None, None].astype(dtype)


# Named attention-variant modules (reference ``components.py`` class
# names).  The encoder consumes them via ``attention_type`` strings +
# additive ``attn_bias`` (one bias per stack instead of per-layer
# recomputation); these classes package the same math as standalone
# drop-ins.

class ALiBi(Module):
    """ALiBi bias producer (ref ``components.py`` ``ALiBi``): call with
    a sequence length to get the (1, H, T, T) additive logits bias."""

    def __init__(self, num_heads):
        self.num_heads = num_heads

    def forward(self, length):
        return alibi_bias(self.num_heads, length)


class RoPEAttention(MultiheadAttention):
    """MHA with rotary position embeddings (ref ``components.py``
    ``RoPEAttention``)."""

    def __init__(self, d_model, num_heads, dropout=0.0, **kwargs):
        super().__init__(d_model, num_heads, dropout=dropout,
                         use_rope=True, **kwargs)


class KerpleLogAttention(MultiheadAttention):
    """MHA with the learnable KERPLE log-kernel relative-position bias
    (ref ``components.py:253``)."""

    def __init__(self, d_model, num_heads, dropout=0.0, **kwargs):
        super().__init__(d_model, num_heads, dropout=dropout, **kwargs)
        self.kerple_p = 2 * jnp.full((num_heads, 1, 1), 0.5)
        self.kerple_a = jnp.full((num_heads, 1, 1), 0.5)

    def forward(self, query, key=None, value=None, **kwargs):
        bias = kerple_log_bias(
            self.kerple_p, self.kerple_a, query.shape[-2])
        extra = kwargs.pop('attn_bias', None)
        if extra is not None:
            bias = bias + extra
        return super().forward(query, key, value, attn_bias=bias,
                               **kwargs)


class LongformerAttention(MultiheadAttention):
    """MHA restricted to a local band of ``window_size`` positions
    (ref ``components.py:346``); rides the fused kernel's pruned
    sliding window when the flash backend is enabled."""

    def __init__(self, d_model, num_heads, window_size=128, dropout=0.0,
                 **kwargs):
        super().__init__(d_model, num_heads, dropout=dropout, **kwargs)
        self.window_size = window_size

    def forward(self, query, key=None, value=None, **kwargs):
        if kwargs.pop('attn_window', None) is None:
            w = self.window_size
            kwargs['attn_window'] = (
                math.ceil(w / 2) - 1, w // 2)
        return super().forward(query, key, value, **kwargs)


# ---- conv feature encoder --------------------------------------------

class _GroupNorm(Module):
    """Channel-wise group norm over (B, C, T); with ``groups == C``
    (wav2vec2 base) this is per-channel instance norm."""

    def __init__(self, num_groups, num_channels, eps=1e-5):
        assert num_channels % num_groups == 0
        self.num_groups = num_groups
        self.eps = eps
        self.weight = jnp.ones((num_channels,))
        self.bias = jnp.zeros((num_channels,))

    def forward(self, x):  # (B, C, T)
        b, c, t = x.shape
        g = self.num_groups
        h = x.reshape(b, g, c // g, t)
        mean = h.mean(axis=(2, 3), keepdims=True)
        var = h.var(axis=(2, 3), keepdims=True)
        h = (h - mean) * jax.lax.rsqrt(var + self.eps)
        h = h.reshape(b, c, t)
        return h * self.weight[None, :, None] + self.bias[None, :, None]


class _ConvLayerBlock(Module):
    def __init__(self, in_ch, out_ch, kernel, stride, bias, norm,
                 layer_norm_eps=1e-5):
        self.conv = nn.Conv1d(in_ch, out_ch, kernel, stride=stride,
                              bias=bias)
        self.norm = norm  # 'group' | 'layer' | None
        if norm == 'group':
            self.layer_norm = _GroupNorm(out_ch, out_ch,
                                         eps=layer_norm_eps)
        elif norm == 'layer':
            self.layer_norm = nn.LayerNorm(out_ch, eps=layer_norm_eps)

    def forward(self, x):  # (B, C, T)
        x = self.conv(x)
        if self.norm == 'group':
            x = self.layer_norm(x)
        elif self.norm == 'layer':
            x = jnp.swapaxes(
                self.layer_norm(jnp.swapaxes(x, 1, 2)), 1, 2)
        return _gelu(x)


class ConvFeatureEncoder(Module):
    """Raw waveform (B, T) → latent frames (B, T', C).

    wav2vec2-base layout: 7 convs, 512 channels, kernels
    (10,3,3,3,3,2,2), strides (5,2,2,2,2,2,2) → 1 frame / 320 samples.
    """

    def __init__(self, conv_dim=(512,) * 7,
                 conv_kernel=(10, 3, 3, 3, 3, 2, 2),
                 conv_stride=(5, 2, 2, 2, 2, 2, 2),
                 conv_bias=False, feat_extract_norm='group',
                 layer_norm_eps=1e-5):
        assert feat_extract_norm in ('group', 'layer'), feat_extract_norm
        self.conv_kernel = tuple(conv_kernel)
        self.conv_stride = tuple(conv_stride)
        dims = [1] + list(conv_dim)
        self.conv_layers = [
            _ConvLayerBlock(
                dims[i], dims[i + 1], conv_kernel[i], conv_stride[i],
                bias=conv_bias,
                norm=('group' if feat_extract_norm == 'group' and i == 0
                      else 'layer' if feat_extract_norm == 'layer'
                      else None),
                layer_norm_eps=layer_norm_eps)
            for i in range(len(conv_dim))
        ]
        self.output_dim = dims[-1]

    def forward(self, audio):
        x = audio[:, None, :]  # (B, 1, T)
        for layer in self.conv_layers:
            x = layer(x)
        return jnp.swapaxes(x, 1, 2)  # (B, T', C)


class FeatureProjection(Module):
    def __init__(self, in_dim, d_model, dropout=0.0, layer_norm_eps=1e-5):
        self.layer_norm = nn.LayerNorm(in_dim, eps=layer_norm_eps)
        self.projection = nn.Linear(in_dim, d_model)
        self.dropout = nn.Dropout(dropout) if dropout else None

    def forward(self, x):
        x = self.projection(self.layer_norm(x))
        if self.dropout is not None:
            x = self.dropout(x)
        return x


# ---- transformer encoder ---------------------------------------------

class _FeedForward(Module):
    """HF naming (intermediate_dense/output_dense) so state dicts map
    1:1."""

    def __init__(self, d_model, d_ff, dropout=0.0):
        self.intermediate_dense = nn.Linear(d_model, d_ff)
        self.output_dense = nn.Linear(d_ff, d_model)
        self.dropout = nn.Dropout(dropout) if dropout else None

    def forward(self, x):
        h = _gelu(self.intermediate_dense(x))
        if self.dropout is not None:
            h = self.dropout(h)
        h = self.output_dense(h)
        if self.dropout is not None:
            h = self.dropout(h)
        return h


class _EncoderLayer(Module):
    """One wav2vec2 transformer layer; ``stable_layer_norm`` switches
    between HF's post-norm (base) and pre-norm (large) variants."""

    def __init__(self, d_model, num_heads, d_ff, dropout=0.0,
                 stable_layer_norm=False, layer_norm_eps=1e-5,
                 use_rope=False):
        self.attention = MultiheadAttention(
            d_model, num_heads, dropout=dropout, use_rope=use_rope)
        self.layer_norm = nn.LayerNorm(d_model, eps=layer_norm_eps)
        self.feed_forward = _FeedForward(d_model, d_ff, dropout=dropout)
        self.final_layer_norm = nn.LayerNorm(d_model, eps=layer_norm_eps)
        self.dropout = nn.Dropout(dropout) if dropout else None
        self.stable_layer_norm = stable_layer_norm

    def forward(self, x, seq_len=None, attn_bias=None, attn_window=None):
        def drop(h):
            return self.dropout(h) if self.dropout is not None else h

        if self.stable_layer_norm:
            x = x + drop(self.attention(
                self.layer_norm(x), key_padding_lens=seq_len,
                attn_bias=attn_bias, attn_window=attn_window))
            x = x + self.feed_forward(self.final_layer_norm(x))
        else:
            x = self.layer_norm(x + drop(self.attention(
                x, key_padding_lens=seq_len, attn_bias=attn_bias,
                attn_window=attn_window)))
            x = self.final_layer_norm(x + self.feed_forward(x))
        return x


class _PosConvEmbed(Module):
    """wav2vec2 grouped conv positional embedding (k=128, groups=16);
    crops the trailing sample for even kernels, exact GELU."""

    def __init__(self, d_model, kernel_size=128, groups=16):
        self.conv = nn.Conv1d(d_model, d_model, kernel_size,
                              padding=kernel_size // 2, groups=groups)
        self.kernel_size = kernel_size

    def forward(self, x):  # (B, T, D) -> positional features (B, T, D)
        h = self.conv(jnp.swapaxes(x, 1, 2))
        if self.kernel_size % 2 == 0:
            h = h[..., :-1]
        return jnp.swapaxes(_gelu(h), 1, 2)


class Wav2Vec2Encoder(Module):
    def __init__(self, d_model, num_layers, num_heads, d_ff,
                 dropout=0.0, stable_layer_norm=False,
                 num_conv_pos_embeddings=128,
                 num_conv_pos_embedding_groups=16, layer_norm_eps=1e-5,
                 attention_type='default', attention_window=128):
        assert attention_type in (
            'default', 'rope', 'alibi', 'kerple', 'longformer'), \
            attention_type
        self.pos_conv_embed = _PosConvEmbed(
            d_model, num_conv_pos_embeddings,
            num_conv_pos_embedding_groups)
        self.layer_norm = nn.LayerNorm(d_model, eps=layer_norm_eps)
        self.dropout = nn.Dropout(dropout) if dropout else None
        self.layers = [
            _EncoderLayer(
                d_model, num_heads, d_ff, dropout=dropout,
                stable_layer_norm=stable_layer_norm,
                layer_norm_eps=layer_norm_eps,
                use_rope=attention_type == 'rope')
            for _ in range(num_layers)
        ]
        self.stable_layer_norm = stable_layer_norm
        self.attention_type = attention_type
        self.attention_window = attention_window
        self.num_heads = num_heads
        if attention_type == 'kerple':
            # per-head learnable kernel params (ref components.py:250)
            self.kerple_p = 2 * jnp.full((num_heads, 1, 1), 0.5)
            self.kerple_a = jnp.full((num_heads, 1, 1), 0.5)

    def _attn_bias(self, length):
        if self.attention_type == 'alibi':
            return alibi_bias(self.num_heads, length)
        if self.attention_type == 'kerple':
            return kerple_log_bias(self.kerple_p, self.kerple_a, length)
        return None

    def _attn_window(self):
        """Longformer's band as a (left, right) window — equal to
        ``longformer_bias`` (tested) but expressed as a mask the fused
        attention backend can *prune* instead of materialize."""
        if self.attention_type == 'longformer':
            w = self.attention_window
            return (math.ceil(w / 2) - 1, w // 2)
        return None

    def forward(self, x, seq_len=None, output_hidden_states=False):
        if seq_len is not None:
            x = x * compute_mask(x, seq_len, 0, 1)
        x = x + self.pos_conv_embed(x)
        if not self.stable_layer_norm:
            x = self.layer_norm(x)
        if self.dropout is not None:
            x = self.dropout(x)
        bias = self._attn_bias(x.shape[1])
        window = self._attn_window()
        hidden_states = [x]
        for layer in self.layers:
            x = layer(x, seq_len=seq_len, attn_bias=bias,
                      attn_window=window)
            hidden_states.append(x)
        if self.stable_layer_norm:
            x = self.layer_norm(x)
            hidden_states[-1] = x
        if output_hidden_states:
            return x, hidden_states
        return x


# ---- full model -------------------------------------------------------

class Wav2Vec2Model(Module):
    """wav2vec 2.0 feature extractor, fully in-repo.

    forward: (B, T) raw 16-kHz audio → ``(features, out_seq_len)``
    where ``features`` is (B, T', D) of ``layer`` (-1 = last; ``None`` =
    list of per-layer hidden states, index 1 = output of the first
    transformer layer, matching the reference's ``extract_layer``
    semantics, ref ``_wav2vec2.py:423``).

    >>> from padertorch_tpu import random as ptrandom
    >>> ptrandom.seed(0)
    >>> m = Wav2Vec2Model(
    ...     conv_dim=(8, 8), conv_kernel=(10, 3), conv_stride=(5, 2),
    ...     d_model=16, num_layers=2, num_heads=2, d_ff=32).eval()
    >>> import jax.numpy as jnp
    >>> x, seq_len = m(jnp.zeros((2, 400)), sequence_lengths=[400, 350])
    >>> x.shape
    (2, 39, 16)
    >>> [int(n) for n in seq_len]
    [39, 34]
    """

    def __init__(
            self,
            conv_dim: tp.Sequence[int] = (512,) * 7,
            conv_kernel: tp.Sequence[int] = (10, 3, 3, 3, 3, 2, 2),
            conv_stride: tp.Sequence[int] = (5, 2, 2, 2, 2, 2, 2),
            conv_bias: bool = False,
            feat_extract_norm: str = 'group',
            d_model: int = 768,
            num_layers: int = 12,
            num_heads: int = 8,
            d_ff: int = 3072,
            dropout: float = 0.0,
            do_stable_layer_norm: bool = False,
            num_conv_pos_embeddings: int = 128,
            num_conv_pos_embedding_groups: int = 16,
            layer_norm_eps: float = 1e-5,
            layer: tp.Optional[int] = -1,
            attention_type: str = 'default',
            attention_window: int = 128,
    ):
        self.feature_extractor = ConvFeatureEncoder(
            conv_dim=conv_dim, conv_kernel=conv_kernel,
            conv_stride=conv_stride, conv_bias=conv_bias,
            feat_extract_norm=feat_extract_norm,
            layer_norm_eps=layer_norm_eps)
        self.feature_projection = FeatureProjection(
            self.feature_extractor.output_dim, d_model,
            dropout=dropout, layer_norm_eps=layer_norm_eps)
        self.encoder = Wav2Vec2Encoder(
            d_model, num_layers, num_heads, d_ff, dropout=dropout,
            stable_layer_norm=do_stable_layer_norm,
            num_conv_pos_embeddings=num_conv_pos_embeddings,
            num_conv_pos_embedding_groups=num_conv_pos_embedding_groups,
            layer_norm_eps=layer_norm_eps,
            attention_type=attention_type,
            attention_window=attention_window)
        self.layer = layer
        self.d_model = self.hidden_size = d_model
        self.num_layers = num_layers
        self.downsample_factor = int(np.prod(conv_stride))
        # receptive field of the conv stack = analysis window size
        window = 1
        for k, s in zip(reversed(conv_kernel), reversed(conv_stride)):
            window = (window - 1) * s + k
        self.window_size = int(window)

    @property
    def frame_rate(self):
        return 16000 // self.downsample_factor

    def compute_output_lengths(self, input_lengths):
        """Samples → frames through the conv stack (VALID convs),
        ref ``_wav2vec2.py:352``."""
        if input_lengths is None:
            return None
        # jnp for traced lengths (inside jit), numpy for host lists
        xp = jnp if isinstance(input_lengths, jax.Array) else np
        out = xp.asarray(input_lengths)
        for k, s in zip(self.feature_extractor.conv_kernel,
                        self.feature_extractor.conv_stride):
            out = (out - k) // s + 1
        return out

    def add_padding(self, sequence_lengths, *, signal=None,
                    fading='half'):
        """Pad so every sample lands in at least one analysis window
        (ref ``_wav2vec2.py:292``): optional symmetric fading by
        ``window - shift`` and right-padding to a full hop multiple.
        Host-side numpy (static shapes for jit)."""
        shift = self.downsample_factor
        length = self.window_size
        seq = np.asarray(sequence_lengths)
        front = 0
        if fading:
            if fading == 'half':
                front = (length - shift) // 2
                back = -(-(length - shift) // 2)
            else:
                front = back = length - shift
            seq = seq + front + back
        pad_size = np.maximum(0, length - seq)
        if shift != 1:
            rem = (seq + pad_size + shift - length) % shift
            pad_size = pad_size + np.where(rem != 0, shift - rem, 0)
        seq = seq + pad_size
        if signal is None:
            return seq
        total = int(seq.max())
        out = np.zeros((len(seq), total), np.float32)
        sig = np.asarray(signal)
        for i, n in enumerate(np.asarray(sequence_lengths)):
            out[i, front:front + int(n)] = sig[i, :int(n)]
        return jnp.asarray(out), seq

    def extract_layer(self, hidden_states):
        if self.layer == -1:
            return hidden_states[-1]
        if self.layer is None:
            return hidden_states[1:]
        if not 1 <= self.layer <= self.num_layers:
            raise ValueError(
                f'`num_layers` must be between [1, {self.num_layers}]')
        return hidden_states[self.layer]

    def forward(self, audio, sequence_lengths=None,
                return_latents=False):
        if audio.ndim == 3:
            # (B, 1, T) -> (B, T); multi-channel input would desync the
            # batch dim from sequence_lengths (the reference flattens
            # (b c t) -> ((b c) t) with the same implicit c == 1)
            assert audio.shape[1] == 1, (
                f'expected (B, 1, T) or (B, T) audio, got {audio.shape}')
            audio = audio[:, 0, :]
        out_seq_len = self.compute_output_lengths(sequence_lengths)
        z = self.feature_extractor(audio)
        if out_seq_len is not None:
            xp = jnp if isinstance(out_seq_len, jax.Array) else np
            out_seq_len = xp.minimum(out_seq_len, z.shape[1])
        if return_latents:
            return z, out_seq_len
        h = self.feature_projection(z)
        _, hidden_states = self.encoder(
            h, seq_len=out_seq_len, output_hidden_states=True)
        return self.extract_layer(hidden_states), out_seq_len


# ---- HF checkpoint import --------------------------------------------

def _t(sd, key):
    return jnp.asarray(np.asarray(sd[key]))


def _linear(lin, sd, prefix):
    # torch Linear stores (out, in); ours is (in, out)
    lin.weight = jnp.asarray(np.asarray(sd[f'{prefix}.weight']).T)
    if f'{prefix}.bias' in sd:
        lin.bias = _t(sd, f'{prefix}.bias')


def _ln(ln, sd, prefix):
    ln.weight = _t(sd, f'{prefix}.weight')
    ln.bias = _t(sd, f'{prefix}.bias')


def _hf_config_to_kwargs(c):
    """Shared HF config fields for the wav2vec2 architecture family
    (Wav2Vec2Config / HubertConfig expose the same names)."""
    return dict(
        conv_dim=tuple(c.conv_dim), conv_kernel=tuple(c.conv_kernel),
        conv_stride=tuple(c.conv_stride), conv_bias=c.conv_bias,
        feat_extract_norm=c.feat_extract_norm,
        d_model=c.hidden_size, num_layers=c.num_hidden_layers,
        num_heads=c.num_attention_heads,
        d_ff=c.intermediate_size,
        do_stable_layer_norm=c.do_stable_layer_norm,
        num_conv_pos_embeddings=c.num_conv_pos_embeddings,
        num_conv_pos_embedding_groups=(
            c.num_conv_pos_embedding_groups),
        layer_norm_eps=c.layer_norm_eps,
    )


def _load_pos_conv(conv, sd, pc):
    """Positional conv embedding: HF stores weight-norm with dim=2
    (per-tap norm over (out, in) — torch weight_norm(conv, dim=2))."""
    if f'{pc}.weight' in sd:
        w = np.asarray(sd[f'{pc}.weight'])
    else:
        for gk, vk in (
                (f'{pc}.weight_g', f'{pc}.weight_v'),
                (f'{pc}.parametrizations.weight.original0',
                 f'{pc}.parametrizations.weight.original1')):
            if gk in sd:
                g = np.asarray(sd[gk])
                v = np.asarray(sd[vk])
                norm = np.sqrt((v ** 2).sum(axis=(0, 1), keepdims=True))
                w = g * v / norm
                break
        else:  # pragma: no cover
            raise KeyError(f'no pos-conv weight under {pc}')
    conv.weight = jnp.asarray(w)
    conv.bias = _t(sd, f'{pc}.bias')


def _load_w2v2_body(model, sd):
    """Load the shared wav2vec2-family trunk (conv encoder, feature
    projection, pos-conv, per-layer FFN/layer norms and default
    q/k/v/out attention projections) from a HF state dict."""
    for i, block in enumerate(model.feature_extractor.conv_layers):
        p = f'feature_extractor.conv_layers.{i}'
        block.conv.weight = _t(sd, f'{p}.conv.weight')
        if f'{p}.conv.bias' in sd:
            block.conv.bias = _t(sd, f'{p}.conv.bias')
        if f'{p}.layer_norm.weight' in sd:
            _ln(block.layer_norm, sd, f'{p}.layer_norm')

    _ln(model.feature_projection.layer_norm, sd,
        'feature_projection.layer_norm')
    _linear(model.feature_projection.projection, sd,
            'feature_projection.projection')
    _load_pos_conv(model.encoder.pos_conv_embed.conv, sd,
                   'encoder.pos_conv_embed.conv')
    _ln(model.encoder.layer_norm, sd, 'encoder.layer_norm')
    for i, lyr in enumerate(model.encoder.layers):
        p = f'encoder.layers.{i}'
        for name in ('q_proj', 'k_proj', 'v_proj', 'out_proj'):
            _linear(getattr(lyr.attention, name), sd,
                    f'{p}.attention.{name}')
        _ln(lyr.layer_norm, sd, f'{p}.layer_norm')
        _linear(lyr.feed_forward.intermediate_dense, sd,
                f'{p}.feed_forward.intermediate_dense')
        _linear(lyr.feed_forward.output_dense, sd,
                f'{p}.feed_forward.output_dense')
        _ln(lyr.final_layer_norm, sd, f'{p}.final_layer_norm')
    return model


def load_hf_wav2vec2(model_path_or_sd, config=None, layer=-1):
    """Build a :class:`Wav2Vec2Model` from a HuggingFace torch
    ``Wav2Vec2Model`` checkpoint (local directory with
    ``pytorch_model.bin``/``model.safetensors`` + ``config.json``, or
    an already-loaded ``state_dict`` plus a config dict).

    torch/transformers are used for deserialization only — the
    returned model is pure JAX.
    """
    if isinstance(model_path_or_sd, dict):
        sd = {k: np.asarray(v) for k, v in model_path_or_sd.items()}
        assert config is not None
        cfg = dict(config)
    else:
        from transformers import Wav2Vec2Model as HFModel
        hf = HFModel.from_pretrained(str(model_path_or_sd))
        sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
        cfg = _hf_config_to_kwargs(hf.config)
    model = Wav2Vec2Model(**cfg, layer=layer)
    return _load_w2v2_body(model, sd).eval()


def load_hf_hubert(model_path_or_sd, config=None, layer=-1):
    """Build a :class:`Wav2Vec2Model` from a HuggingFace torch
    ``HubertModel`` checkpoint (reference ``ssl/hubert.py`` delegates
    to the pretrained model; HuBERT's inference graph is exactly the
    wav2vec2 trunk — conv feature encoder + transformer encoder — so
    the native Wav2Vec2Model runs it on-TPU)."""
    if isinstance(model_path_or_sd, dict):
        sd = {k: np.asarray(v) for k, v in model_path_or_sd.items()}
        assert config is not None
        cfg = dict(config)
    else:
        from transformers import HubertModel as HFModel
        hf = HFModel.from_pretrained(str(model_path_or_sd))
        if not getattr(hf.config, 'feat_proj_layer_norm', True):
            raise NotImplementedError(
                'feat_proj_layer_norm=False HuBERT variants are not '
                'supported')
        sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
        cfg = _hf_config_to_kwargs(hf.config)
    model = Wav2Vec2Model(**cfg, layer=layer)
    return _load_w2v2_body(model, sd).eval()


