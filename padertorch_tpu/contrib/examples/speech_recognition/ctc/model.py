"""Conformer-CTC speech recognizer.

Beyond-reference recipe model (padertorch ships no ASR example): the
canonical speech-recognition stack — normalized log-mel frontend with
SpecAugment, 4x convolutional time subsampling, conformer encoder, and
a CTC head — assembled from the framework's primitives:

- frontend: :class:`padertorch_tpu.contrib.je.modules.features.
  NormalizedLogMelExtractor` (jit-safe SpecAugment in train mode);
- encoder: :class:`padertorch_tpu.modules.conformer.ConformerEncoder`
  (masked batch norm, RoPE attention; rides the fused Pallas attention
  kernel via ``set_attention_backend``, and supports causal/windowed
  variants for streaming);
- loss: :func:`padertorch_tpu.ops.losses.ctc_loss` (pure-XLA lattice
  forward — the whole train step is one compiled program).
"""
import jax
import jax.numpy as jnp
import numpy as np

from padertorch_tpu.base import Model
from padertorch_tpu import nn
from padertorch_tpu.contrib.je.modules.features import (
    NormalizedLogMelExtractor,
)
from padertorch_tpu.modules.conformer import ConformerEncoder
from padertorch_tpu.ops.losses.ctc import (
    ctc_loss, ctc_greedy_decode, edit_distance,
)

__all__ = ['ConformerCTC']


class ConformerCTC(Model):
    """Log-mel -> conv subsample (4x) -> conformer -> CTC logits.

    ``vocab_size`` counts real tokens; the head has ``vocab_size + 1``
    outputs with blank = 0 (labels are ids in ``1..vocab_size``).
    """

    @classmethod
    def finalize_dogmatic_config(cls, config):
        config['feature_extractor'] = {
            'factory': NormalizedLogMelExtractor,
            'sample_rate': 8000,
            'stft_size': 256,
            'number_of_filters': 40,
            # SpecAugment (train mode only; jit-safe)
            'n_time_masks': 2,
            'max_masked_time_steps': 20,
            'n_frequency_masks': 1,
            'max_masked_frequency_bands': 8,
        }

    def __init__(self, feature_extractor, vocab_size,
                 d_model=96, num_layers=2, num_heads=4, d_ff=None,
                 kernel_size=15, dropout=0.0, conv_norm='batch_norm',
                 causal=False, attn_window=None,
                 subsample_channels=32):
        self.feature_extractor = feature_extractor
        c = subsample_channels
        # two stride-2 convs over (mel, time): 4x frame-rate reduction,
        # the standard conformer front.  Padding is applied explicitly in
        # forward: kernel 3 / stride 2 / total time pad 2 gives ceil(T/2)
        # either way, but the causal variant puts both pad frames on the
        # LEFT so no output frame sees the future (exact prefix property,
        # like the encoder's left-padded depthwise convs).
        self.subsample_convs = [
            nn.Conv2d(1, c, 3, stride=(2, 2), padding=0),
            nn.Conv2d(c, c, 3, stride=(2, 2), padding=0),
        ]
        self.causal = causal
        mels = feature_extractor.mel_transform.number_of_filters
        reduced_mels = -(-(-(-mels // 2)) // 2)  # ceil(ceil(M/2)/2)
        self.encoder = ConformerEncoder(
            d_model=d_model, num_layers=num_layers, num_heads=num_heads,
            d_ff=d_ff, kernel_size=kernel_size, dropout=dropout,
            conv_norm=conv_norm, causal=causal, attn_window=attn_window,
            input_size=c * reduced_mels,
        )
        self.head = nn.Linear(d_model, vocab_size + 1)
        self.vocab_size = vocab_size
        self.blank = 0

    def forward(self, inputs):
        seq_len = inputs.get('seq_len')
        x, seq_len = self.feature_extractor(
            inputs['stft'], seq_len=seq_len)  # (B, 1, M, T)
        t_pad = (2, 0) if self.causal else (1, 1)
        h = x
        for conv in self.subsample_convs:
            h = jnp.pad(h, ((0, 0), (0, 0), (1, 1), t_pad))
            h = jax.nn.relu(conv(h))
        # h: (B, C, M', T')
        b, c, m, t = h.shape
        h = jnp.transpose(h, (0, 3, 1, 2)).reshape(b, t, c * m)
        if seq_len is not None:
            seq_len = jnp.asarray(seq_len)
            seq_len = -(-seq_len // 2)
            seq_len = -(-seq_len // 2)
        h = self.encoder(h, seq_len=seq_len)
        logits = self.head(h)  # (B, T', V+1)
        return {'logits': logits, 'logit_lengths': seq_len}

    def review(self, inputs, outputs):
        logits = outputs['logits']
        logit_lengths = outputs['logit_lengths']
        if logit_lengths is None:
            logit_lengths = jnp.full(
                (logits.shape[0],), logits.shape[1], dtype='int32')
        label_lengths = jnp.asarray(inputs['label_lengths'])
        nll = ctc_loss(
            logits, logit_lengths, jnp.asarray(inputs['labels']),
            label_lengths, blank=self.blank)
        per_token = nll / jnp.maximum(label_lengths, 1)
        return {
            'loss': jnp.mean(per_token),
            'scalars': {
                'per_utt_nll': jnp.mean(nll),
                'blank_rate': jnp.mean(
                    (jnp.argmax(logits, -1) == self.blank)
                    .astype('float32')),
            },
        }

    def decode(self, batch):
        """Greedy transcriptions + token error rates for a batch.

        Host-side helper for evaluation (argmax path collapse; WER =
        Levenshtein distance / reference length).
        """
        outputs = self(batch)
        hyps = ctc_greedy_decode(
            np.asarray(outputs['logits']),
            np.asarray(outputs['logit_lengths']),
            blank=self.blank)
        results = {}
        labels = np.asarray(batch['labels'])
        label_lengths = np.asarray(batch['label_lengths'])
        for i, example_id in enumerate(batch['example_id']):
            ref = labels[i, :label_lengths[i]].tolist()
            hyp = hyps[i]
            results[example_id] = {
                'reference': ref,
                'hypothesis': hyp,
                'num_errors': edit_distance(ref, hyp),
                'num_tokens': len(ref),
            }
        return results
