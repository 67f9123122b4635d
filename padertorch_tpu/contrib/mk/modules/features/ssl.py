"""Self-supervised speech representation extractors (wav2vec2 family).

Reference parity: ``padertorch/contrib/mk/modules/features/ssl`` — the
reference ports fairseq/HF wav2vec2/WavLM/HuBERT checkpoints to torch.
Here wav2vec2 is a **self-contained JAX graph**
(:mod:`padertorch_tpu.contrib.mk.modules.features.wav2vec2`: conv
feature encoder + transformer encoder, HF-checkpoint importer, ALiBi/
RoPE/KERPLE/Longformer attention variants) that jits into the training
step; a HuggingFace **Flax** delegate remains available as
``backend='flax'``.  WavLM (gated relative position bias,
:mod:`...features.wavlm`) and HuBERT (wav2vec2 trunk) are native JAX
too (``backend='native'``, the default); ``backend='torch'`` keeps the
host-side torch-CPU extractor for data pipelines that want a frozen
frontend off the TPU graph.

Pretrained weights require a local checkpoint (or network access); in
offline environments construct with ``pretrained=False`` (random init,
same architecture) or pass a local ``model_path``.

>>> from padertorch_tpu import random as ptrandom
>>> ptrandom.seed(0)
>>> w2v = Wav2Vec2(pretrained=False, tiny=True)
>>> import jax.numpy as jnp
>>> x, seq_len = w2v(jnp.zeros((2, 800)), sequence_lengths=[800, 700])
>>> x.shape
(2, 79, 16)
>>> [int(n) for n in seq_len]
[79, 69]
"""
import numpy as np
import jax.numpy as jnp

from padertorch_tpu.base import Module
from padertorch_tpu.contrib.mk.modules.features.wav2vec2 import (
    Wav2Vec2Model, load_hf_wav2vec2,
)

__all__ = ['Wav2Vec2', 'WavLM', 'HuBERT', 'SAMPLING_RATE',
           'PR_BASE_LAYER', 'PR_LARGE_LAYER', 'SID_BASE_LAYER',
           'SID_LARGE_LAYER', 'tuple_to_int']

SAMPLING_RATE = 16_000

# layer indices from the WavLM paper (reference ssl/wavlm.py:13):
# phoneme recognition / speaker id, base and large variants
PR_BASE_LAYER = 11
PR_LARGE_LAYER = 22
SID_BASE_LAYER = 4
SID_LARGE_LAYER = 6


def tuple_to_int(sequence) -> list:
    """[(n,), (m,), ...] -> [n, m, ...] (reference ssl/wavlm.py:19)."""
    return list(map(lambda t: t[0], sequence))


_TINY_W2V2 = dict(
    conv_dim=(8, 8), conv_kernel=(10, 3), conv_stride=(5, 2),
    d_model=16, num_layers=2, num_heads=2, d_ff=32)


class Wav2Vec2(Module):
    """Frozen (or finetunable) wav2vec2 feature extractor, on-TPU.

    Reference parity: ``ssl/wav2vec2/_wav2vec2.py:33`` (``Wav2Vec2``).
    forward: (B, T) raw audio at 16 kHz -> ``(features, seq_len)`` with
    features (B, frames, hidden) of ``layer`` (-1 = last; ``None`` =
    list of per-transformer-layer hidden states; int ``l`` in
    [1, num_layers] = output of layer ``l``).

    ``backend='native'`` (default) uses the in-repo JAX graph
    (:class:`...features.wav2vec2.Wav2Vec2Model`) — jittable,
    finetunable, HF-checkpoint-importable.  ``backend='flax'`` wraps
    HuggingFace's FlaxWav2Vec2Model instead.  ``tiny=True`` builds a
    small random-init config for tests/docs.
    """

    def __init__(self, model_path='facebook/wav2vec2-base',
                 pretrained=True, trainable=False, layer=-1,
                 backend='native', tiny=False, dtype='float32',
                 attention_type='default', **config_overrides):
        self.layer = layer
        self.backend = backend
        if backend == 'native':
            if pretrained:
                model = load_hf_wav2vec2(model_path, layer=layer)
            else:
                cfg = dict(_TINY_W2V2) if tiny else {}
                cfg.update(config_overrides)
                model = Wav2Vec2Model(
                    **cfg, layer=layer,
                    attention_type=attention_type).eval()
            if trainable:
                self.model = model
            else:
                self.register_buffer('model', model)
            self.hidden_size = model.hidden_size
            self.downsample_factor = model.downsample_factor
            self.window_size = model.window_size
            self.num_layers = model.num_layers
        elif backend == 'flax':
            try:
                from transformers import (
                    FlaxWav2Vec2Model, Wav2Vec2Config)
            except ImportError as e:  # pragma: no cover
                raise ImportError(
                    'transformers with Flax support is required for '
                    'backend="flax".') from e
            if pretrained:
                hf_model = FlaxWav2Vec2Model.from_pretrained(
                    model_path, dtype=jnp.dtype(dtype))
            else:
                config = Wav2Vec2Config()
                hf_model = FlaxWav2Vec2Model(
                    config, dtype=jnp.dtype(dtype))
            self._module = hf_model.module
            self.hidden_size = hf_model.config.hidden_size
            # same length arithmetic as the native backend, derived
            # from the HF config's conv stack
            self._conv_kernel = tuple(hf_model.config.conv_kernel)
            self._conv_stride = tuple(hf_model.config.conv_stride)
            self.downsample_factor = int(
                np.prod(hf_model.config.conv_stride))
            self.num_layers = hf_model.config.num_hidden_layers
            if trainable:
                self.params = hf_model.params
            else:
                self.register_buffer('params', hf_model.params)
        else:
            raise ValueError(f'Unknown backend: {backend}')

    @property
    def frame_rate(self):
        return SAMPLING_RATE // self.downsample_factor

    def add_padding(self, sequence_lengths, *, signal=None,
                    fading='half'):
        if self.backend != 'native':
            raise NotImplementedError(
                'add_padding requires backend="native"')
        return self.model.add_padding(
            sequence_lengths, signal=signal, fading=fading)

    def compute_output_lengths(self, input_lengths):
        if self.backend == 'native':
            return self.model.compute_output_lengths(input_lengths)
        if input_lengths is None:
            return None
        out = np.asarray(input_lengths)
        for k, s in zip(self._conv_kernel, self._conv_stride):
            out = (out - k) // s + 1
        return out

    def forward(self, audio, sequence_lengths=None,
                return_latents=False):
        """Both backends return ``(features, out_seq_len)``."""
        if self.backend == 'native':
            return self.model(
                audio, sequence_lengths=sequence_lengths,
                return_latents=return_latents)
        attention_mask = None
        if sequence_lengths is not None:
            idx = jnp.arange(audio.shape[-1])[None, :]
            attention_mask = (
                idx < jnp.asarray(sequence_lengths)[:, None]
            ).astype('int32')
        outputs = self._module.apply(
            {'params': self.params}, audio,
            attention_mask=attention_mask, deterministic=True,
            output_hidden_states=self.layer != -1)
        if self.layer == -1:
            feats = outputs.last_hidden_state
        elif self.layer is None:
            feats = list(outputs.hidden_states)
        else:
            feats = outputs.hidden_states[self.layer]
        out_seq_len = self.compute_output_lengths(sequence_lengths)
        if out_seq_len is not None:
            ref = feats[-1] if isinstance(feats, list) else feats
            out_seq_len = np.minimum(out_seq_len, ref.shape[1])
        return feats, out_seq_len


class _TorchSSLExtractor:
    """Host-side frozen SSL frontend for the data pipeline.

    ``__call__(audio (B, T) or (T,) numpy) -> numpy features``; map it
    over a dataset (optionally inside ``.prefetch``) and feed the
    resulting features to the TPU model.
    """

    hf_model_cls = None  # set via build()

    @classmethod
    def build(cls, hf_model_cls, config_cls, model_path,
              pretrained=True, layer=-1):
        ext = cls.__new__(cls)
        ext.hf_model_cls = hf_model_cls
        ext.__init__(model_path, pretrained=pretrained, layer=layer,
                     config_cls=config_cls)
        return ext

    def __init__(self, model_path, pretrained=True, layer=-1,
                 config_cls=None):
        import torch
        self._torch = torch
        if pretrained:
            model = self.hf_model_cls.from_pretrained(model_path)
        else:
            model = self.hf_model_cls(config_cls())
        model.eval()
        for p in model.parameters():
            p.requires_grad = False
        self.model = model
        self.hidden_size = model.config.hidden_size
        self.layer = layer

    def __call__(self, audio, sequence_lengths=None):
        torch = self._torch
        audio = np.asarray(audio, dtype=np.float32)
        squeeze = audio.ndim == 1
        if squeeze:
            audio = audio[None]
        attention_mask = None
        if sequence_lengths is not None:
            idx = np.arange(audio.shape[-1])[None, :]
            attention_mask = torch.from_numpy(
                (idx < np.asarray(sequence_lengths)[:, None])
                .astype(np.int64))
        with torch.no_grad():
            out = self.model(
                torch.from_numpy(audio),
                attention_mask=attention_mask,
                output_hidden_states=self.layer != -1)
        if self.layer == -1:
            feats = out.last_hidden_state.numpy()
        elif self.layer is None:
            feats = [h.numpy() for h in out.hidden_states]
            return feats if not squeeze else [f[0] for f in feats]
        else:
            feats = out.hidden_states[self.layer].numpy()
        return feats[0] if squeeze else feats


class _NativeSSLWrapper(Module):
    """Shared native-backend plumbing for WavLM/HuBERT: holds the pure
    JAX model (buffer when frozen), exposes the Wav2Vec2-style
    forward/length/padding API."""

    def _wrap(self, model, trainable):
        if trainable:
            self.model = model
        else:
            self.register_buffer('model', model)
        self.hidden_size = model.hidden_size
        self.downsample_factor = model.downsample_factor
        self.window_size = model.window_size
        self.num_layers = model.num_layers

    @property
    def frame_rate(self):
        return SAMPLING_RATE // self.downsample_factor

    def add_padding(self, sequence_lengths, *, signal=None,
                    fading='half'):
        return self.model.add_padding(
            sequence_lengths, signal=signal, fading=fading)

    def compute_output_lengths(self, input_lengths):
        return self.model.compute_output_lengths(input_lengths)

    def forward(self, audio, sequence_lengths=None,
                return_latents=False):
        return self.model(
            audio, sequence_lengths=sequence_lengths,
            return_latents=return_latents)


class WavLM(_NativeSSLWrapper):
    """WavLM features (reference ssl/wavlm.py:23); see
    ``PR_*/SID_*_LAYER`` for task-appropriate layer choices.

    ``backend='native'`` (default) runs the in-repo JAX WavLM graph
    (:class:`...features.wavlm.WavLMModel` — gated relative position
    bias attention, HF-checkpoint-importable, jittable/finetunable).
    ``backend='torch'`` keeps the host-side torch-CPU extractor.

    >>> from padertorch_tpu import random as ptrandom
    >>> ptrandom.seed(0)
    >>> m = WavLM(pretrained=False, tiny=True)
    >>> import jax.numpy as jnp
    >>> x, seq_len = m(jnp.zeros((2, 800)), sequence_lengths=[800, 700])
    >>> x.shape
    (2, 79, 16)
    """

    def __init__(self, model_path='microsoft/wavlm-base',
                 pretrained=True, trainable=False, layer=-1,
                 backend='native', tiny=False, **config_overrides):
        if 'wavlm' not in str(model_path).lower():
            raise ValueError(
                'WavLM only supports WavLM models.\n'
                f'model_path: {model_path}')
        self.layer = layer
        self.backend = backend
        if backend == 'native':
            from padertorch_tpu.contrib.mk.modules.features.wavlm \
                import WavLMModel, load_hf_wavlm
            if pretrained:
                model = load_hf_wavlm(model_path, layer=layer)
            else:
                cfg = dict(_TINY_W2V2, num_buckets=32,
                           max_bucket_distance=64) if tiny else {}
                cfg.update(config_overrides)
                model = WavLMModel(**cfg, layer=layer).eval()
            self._wrap(model, trainable)
        elif backend == 'torch':
            from transformers import WavLMConfig, WavLMModel
            self._torch_extractor = _TorchSSLExtractor.build(
                WavLMModel, WavLMConfig, model_path,
                pretrained=pretrained, layer=layer)
            self.hidden_size = self._torch_extractor.hidden_size
        else:
            raise ValueError(f'Unknown backend: {backend}')

    def forward(self, audio, sequence_lengths=None,
                return_latents=False):
        if self.backend == 'torch':
            assert not return_latents, (
                'return_latents requires backend="native"')
            return (self._torch_extractor(audio, sequence_lengths),
                    None)
        return super().forward(audio, sequence_lengths=sequence_lengths,
                               return_latents=return_latents)


class HuBERT(_NativeSSLWrapper):
    """HuBERT features (reference ssl/hubert.py).  HuBERT's inference
    graph is the wav2vec2 trunk, so ``backend='native'`` (default)
    runs it via :class:`...features.wav2vec2.Wav2Vec2Model` with the
    HuBERT checkpoint importer; ``backend='torch'`` keeps the
    host-side torch-CPU extractor.

    >>> from padertorch_tpu import random as ptrandom
    >>> ptrandom.seed(0)
    >>> m = HuBERT(pretrained=False, tiny=True)
    >>> import jax.numpy as jnp
    >>> x, seq_len = m(jnp.zeros((2, 800)), sequence_lengths=[800, 700])
    >>> x.shape
    (2, 79, 16)
    """

    def __init__(self, model_path='facebook/hubert-base-ls960',
                 pretrained=True, trainable=False, layer=-1,
                 backend='native', tiny=False, **config_overrides):
        if 'hubert' not in str(model_path).lower():
            raise ValueError(
                'HuBERT only supports HuBERT models.\n'
                f'model_path: {model_path}')
        self.layer = layer
        self.backend = backend
        if backend == 'native':
            from padertorch_tpu.contrib.mk.modules.features.wav2vec2 \
                import load_hf_hubert
            if pretrained:
                model = load_hf_hubert(model_path, layer=layer)
            else:
                cfg = dict(_TINY_W2V2) if tiny else {}
                cfg.update(config_overrides)
                model = Wav2Vec2Model(**cfg, layer=layer).eval()
            self._wrap(model, trainable)
        elif backend == 'torch':
            from transformers import HubertConfig, HubertModel
            self._torch_extractor = _TorchSSLExtractor.build(
                HubertModel, HubertConfig, model_path,
                pretrained=pretrained, layer=layer)
            self.hidden_size = self._torch_extractor.hidden_size
        else:
            raise ValueError(f'Unknown backend: {backend}')

    def forward(self, audio, sequence_lengths=None,
                return_latents=False):
        if self.backend == 'torch':
            assert not return_latents, (
                'return_latents requires backend="native"')
            return (self._torch_extractor(audio, sequence_lengths),
                    None)
        return super().forward(audio, sequence_lengths=sequence_lengths,
                               return_latents=return_latents)
