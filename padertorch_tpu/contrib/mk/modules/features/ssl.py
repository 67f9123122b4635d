"""Self-supervised speech representation extractors (wav2vec2 family).

Reference parity: ``padertorch/contrib/mk/modules/features/ssl`` — the
reference ports fairseq/HF wav2vec2/WavLM/HuBERT checkpoints to torch;
here the natural TPU path is HuggingFace's **Flax** wav2vec2, wrapped in
the framework's Module API so SSL features drop into any recipe.

Weights download requires network access; in offline environments
construct with ``pretrained=False`` (random init, same architecture) or
pass a local ``model_path``.
"""
import numpy as np
import jax.numpy as jnp

from padertorch_tpu.base import Module

__all__ = ['Wav2Vec2']


class Wav2Vec2(Module):
    """Frozen (or finetunable) wav2vec2 feature extractor.

    forward: (B, T) raw audio at 16 kHz -> (B, frames, hidden) features.
    """

    def __init__(self, model_path='facebook/wav2vec2-base',
                 pretrained=True, trainable=False, dtype='float32'):
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
            attention_mask=attention_mask, deterministic=True)
        return outputs.last_hidden_state
