"""Self-supervised speech representation extractors (wav2vec2 family).

Reference parity: ``padertorch/contrib/mk/modules/features/ssl`` — the
reference ports fairseq/HF wav2vec2/WavLM/HuBERT checkpoints to torch;
here wav2vec2 uses HuggingFace's **Flax** port (runs on TPU inside the
training graph), while WavLM/HuBERT (no Flax port exists upstream) are
host-side torch-CPU extractors meant for the data pipeline — the usual
deployment for *frozen* SSL frontends, and it keeps the TPU graph free
of per-layer host callbacks.

Weights download requires network access; in offline environments
construct with ``pretrained=False`` (random init, same architecture) or
pass a local ``model_path``.
"""
import numpy as np
import jax.numpy as jnp

from padertorch_tpu.base import Module

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


class Wav2Vec2(Module):
    """Frozen (or finetunable) wav2vec2 feature extractor (Flax, on-TPU).

    forward: (B, T) raw audio at 16 kHz -> (B, frames, hidden) features
    of ``layer`` (-1 = last; None = list of all hidden states).
    """

    def __init__(self, model_path='facebook/wav2vec2-base',
                 pretrained=True, trainable=False, layer=-1,
                 dtype='float32'):
        try:
            from transformers import FlaxWav2Vec2Model, Wav2Vec2Config
        except ImportError as e:  # pragma: no cover
            raise ImportError(
                'transformers with Flax support is required for '
                'Wav2Vec2 features.') from e
        if pretrained:
            hf_model = FlaxWav2Vec2Model.from_pretrained(
                model_path, dtype=jnp.dtype(dtype))
        else:
            config = Wav2Vec2Config()
            hf_model = FlaxWav2Vec2Model(config, dtype=jnp.dtype(dtype))
        self._module = hf_model.module
        self.hidden_size = hf_model.config.hidden_size
        self.layer = layer
        if trainable:
            self.params = hf_model.params
        else:
            self.register_buffer('params', hf_model.params)

    def forward(self, audio, sequence_lengths=None):
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
            return outputs.last_hidden_state
        if self.layer is None:
            return list(outputs.hidden_states)
        return outputs.hidden_states[self.layer]


class _TorchSSLExtractor:
    """Host-side frozen SSL frontend for the data pipeline.

    ``__call__(audio (B, T) or (T,) numpy) -> numpy features``; map it
    over a dataset (optionally inside ``.prefetch``) and feed the
    resulting features to the TPU model.
    """

    hf_model_cls = None  # set in subclass

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


class WavLM(_TorchSSLExtractor):
    """WavLM features (reference ssl/wavlm.py:23); see
    ``PR_*/SID_*_LAYER`` for task-appropriate layer choices."""

    def __init__(self, model_path='microsoft/wavlm-base',
                 pretrained=True, layer=-1):
        from transformers import WavLMConfig, WavLMModel
        if 'wavlm' not in str(model_path).lower():
            raise ValueError(
                'WavLM only supports WavLM models.\n'
                f'model_path: {model_path}')
        type(self).hf_model_cls = WavLMModel
        super().__init__(model_path, pretrained=pretrained, layer=layer,
                         config_cls=WavLMConfig)


class HuBERT(_TorchSSLExtractor):
    """HuBERT features (reference ssl/hubert.py)."""

    def __init__(self, model_path='facebook/hubert-base-ls960',
                 pretrained=True, layer=-1):
        from transformers import HubertConfig, HubertModel
        if 'hubert' not in str(model_path).lower():
            raise ValueError(
                'HuBERT only supports HuBERT models.\n'
                f'model_path: {model_path}')
        type(self).hf_model_cls = HubertModel
        super().__init__(model_path, pretrained=pretrained, layer=layer,
                         config_cls=HubertConfig)
