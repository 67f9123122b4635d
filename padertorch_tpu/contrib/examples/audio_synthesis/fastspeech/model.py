"""FastSpeech-style non-autoregressive text-to-mel acoustic model.

Beyond-reference: completes the in-framework synthesis chain — this
model predicts log-mel spectrograms from token sequences, and the GAN
vocoder recipe (``../gan_vocoder``) turns mels into waveforms.  The
reference only ships vocoder inference wrappers (mk/synthesis).

TPU-first design notes:

- Fully parallel (non-autoregressive): encoder, length regulator, and
  decoder are one feed-forward pass — the whole utterance synthesizes
  in a single jitted call, unlike AR attention-based TTS.
- The length regulator is a pure gather: frame ``t`` reads the token
  whose cumulative-duration interval contains ``t``
  (``sum_n(ends <= t)``), so expansion is a rank-preserving
  ``take_along_axis`` with static shapes — no ragged host loops.
- Transformer blocks reuse :class:`...mk.modules.transformer.
  TransformerEncoder` (RoPE attention, flash-backend compatible,
  sequence-masked).
"""
import jax.numpy as jnp

from padertorch_tpu import nn
from padertorch_tpu.base import Model
from padertorch_tpu.module import Module
from padertorch_tpu.contrib.mk.modules.transformer import (
    TransformerEncoder,
)
from padertorch_tpu.ops.sequence.mask import compute_mask

__all__ = ['DurationPredictor', 'length_regulate', 'FastSpeech']


class DurationPredictor(Module):
    """Two conv blocks + linear -> per-token log duration (B, N)."""

    def __init__(self, d_model, hidden=None, kernel_size=3, dropout=0.1):
        hidden = hidden or d_model
        pad = (kernel_size - 1) // 2
        self.conv1 = nn.Conv1d(d_model, hidden, kernel_size, padding=pad)
        self.norm1 = nn.LayerNorm(hidden)
        self.conv2 = nn.Conv1d(hidden, hidden, kernel_size, padding=pad)
        self.norm2 = nn.LayerNorm(hidden)
        self.drop = nn.Dropout(dropout) if dropout else None
        self.out = nn.Linear(hidden, 1)

    def forward(self, x, seq_len=None):  # (B, N, D) -> (B, N)
        for conv, norm in ((self.conv1, self.norm1),
                           (self.conv2, self.norm2)):
            x = jnp.swapaxes(conv(jnp.swapaxes(x, 1, 2)), 1, 2)
            x = norm(jnp.maximum(x, 0.0))
            if self.drop is not None:
                x = self.drop(x)
        log_dur = self.out(x)[..., 0]
        if seq_len is not None:
            log_dur = log_dur * compute_mask(log_dur, seq_len, 0, 1)
        return log_dur


def length_regulate(encoded, durations, max_frames):
    """Expand token encodings by integer durations (pure gather).

    Args:
        encoded: (B, N, D) token encodings.
        durations: (B, N) integer frame counts (0 for padding).
        max_frames: static output length T.

    Returns:
        (frames, num_frames): (B, T, D) expanded encodings (zero past
        each example's total duration) and (B,) valid frame counts.

    >>> import jax.numpy as jnp
    >>> enc = jnp.arange(6, dtype='float32').reshape(1, 3, 2)
    >>> frames, n = length_regulate(enc, jnp.array([[2, 1, 3]]), 8)
    >>> frames[0, :, 0].tolist()
    [0.0, 0.0, 2.0, 4.0, 4.0, 4.0, 0.0, 0.0]
    >>> int(n[0])
    6
    """
    durations = jnp.asarray(durations, 'int32')
    ends = jnp.cumsum(durations, axis=1)  # (B, N)
    total = ends[:, -1]
    t_idx = jnp.arange(max_frames, dtype='int32')  # (T,)
    # token owning frame t: number of intervals already finished
    tok = jnp.sum(
        t_idx[None, None, :] >= ends[:, :, None], axis=1)  # (B, T)
    tok = jnp.clip(tok, 0, encoded.shape[1] - 1)
    frames = jnp.take_along_axis(
        encoded, tok[:, :, None], axis=1)  # (B, T, D)
    valid = (t_idx[None, :] < total[:, None])[..., None]
    return frames * valid.astype(encoded.dtype), total


class FastSpeech(Model):
    """Token sequence -> log-mel spectrogram.

    Training uses teacher durations (``inputs['durations']``); the
    duration predictor learns them in the log domain and drives
    inference-time :meth:`synthesize`.
    """

    @classmethod
    def finalize_dogmatic_config(cls, config):
        d_model = config.get('d_model', 128)
        config['encoder'] = {
            'factory': TransformerEncoder,
            'd_model': d_model, 'num_layers': 2, 'num_heads': 2,
            'd_ff': 4 * d_model,
        }
        config['decoder'] = {
            'factory': TransformerEncoder,
            'd_model': d_model, 'num_layers': 2, 'num_heads': 2,
            'd_ff': 4 * d_model,
        }
        config['duration_predictor'] = {
            'factory': DurationPredictor, 'd_model': d_model,
        }

    def __init__(self, vocab_size=16, n_mels=80, d_model=128,
                 encoder=None, decoder=None, duration_predictor=None,
                 duration_loss_weight=0.5):
        self.vocab_size = vocab_size
        self.n_mels = n_mels
        self.d_model = d_model
        self.embed = nn.Embedding(vocab_size, d_model)
        self.encoder = encoder if encoder is not None else \
            TransformerEncoder(d_model=d_model, num_layers=2,
                               num_heads=2, d_ff=4 * d_model)
        self.decoder = decoder if decoder is not None else \
            TransformerEncoder(d_model=d_model, num_layers=2,
                               num_heads=2, d_ff=4 * d_model)
        self.duration_predictor = duration_predictor \
            if duration_predictor is not None \
            else DurationPredictor(d_model)
        self.mel_head = nn.Linear(d_model, n_mels)
        self.duration_loss_weight = duration_loss_weight

    def _encode(self, tokens, token_lengths):
        return self.encoder(self.embed(tokens), seq_len=token_lengths)

    def forward(self, inputs):
        tokens = jnp.asarray(inputs['tokens'])
        token_lengths = inputs['token_lengths']
        durations = jnp.asarray(inputs['durations'])
        h = self._encode(tokens, token_lengths)
        log_dur_pred = self.duration_predictor(h, token_lengths)
        frames, num_frames = length_regulate(
            h, durations, inputs['mel'].shape[1])
        mel_pred = self.mel_head(self.decoder(frames, seq_len=num_frames))
        mel_pred = mel_pred * compute_mask(
            mel_pred[..., 0], num_frames, 0, 1)[..., None]
        return {
            'mel': mel_pred,               # (B, T, M)
            'num_frames': num_frames,
            'log_durations': log_dur_pred,
        }

    def review(self, inputs, outputs):
        mel_target = jnp.asarray(inputs['mel'])
        mask = compute_mask(
            mel_target[..., 0], outputs['num_frames'], 0, 1)[..., None]
        denom = jnp.maximum(jnp.sum(mask) * self.n_mels, 1.0)
        mel_l1 = jnp.sum(jnp.abs(outputs['mel'] - mel_target) * mask) \
            / denom
        # duration loss in the log domain (FastSpeech convention)
        durations = jnp.asarray(inputs['durations'])
        tok_mask = compute_mask(
            outputs['log_durations'], inputs['token_lengths'], 0, 1)
        log_dur_target = jnp.log(
            jnp.maximum(durations.astype('float32'), 1.0))
        dur_mse = jnp.sum(
            jnp.square(outputs['log_durations'] - log_dur_target)
            * tok_mask) / jnp.maximum(jnp.sum(tok_mask), 1.0)
        review = {
            'loss': mel_l1 + self.duration_loss_weight * dur_mse,
            'scalars': {'mel_l1': mel_l1, 'duration_mse': dur_mse},
        }
        if self.create_snapshot:
            review['snapshots'] = {
                'mel_prediction': outputs['mel'][0].T,
                'mel_target': mel_target[0].T,
            }
        return review

    def modify_summary(self, summary):
        from padertorch_tpu.summary.tbx_utils import spectrogram_to_image
        for key in list(summary['snapshots']):
            summary['images'][key] = spectrogram_to_image(
                summary['snapshots'].pop(key))
        return super().modify_summary(summary)

    def synthesize(self, tokens, token_lengths=None, max_frames=None,
                   duration_scale=1.0):
        """Inference: predicted durations drive the length regulator.

        Returns (mel (B, T, M), num_frames (B,), durations (B, N)).
        """
        tokens = jnp.asarray(tokens)
        if token_lengths is None:
            token_lengths = jnp.full(
                (tokens.shape[0],), tokens.shape[1], dtype='int32')
        h = self._encode(tokens, token_lengths)
        log_dur = self.duration_predictor(h, token_lengths)
        durations = jnp.round(
            jnp.exp(log_dur) * duration_scale).astype('int32')
        tok_mask = compute_mask(log_dur, token_lengths, 0, 1)
        durations = jnp.maximum(durations, 1) * tok_mask.astype('int32')
        if max_frames is None:
            max_frames = int(jnp.max(jnp.sum(durations, axis=1)))
        frames, num_frames = length_regulate(h, durations, max_frames)
        mel = self.mel_head(self.decoder(frames, seq_len=num_frames))
        mel = mel * compute_mask(
            mel[..., 0], num_frames, 0, 1)[..., None]
        return mel, num_frames, durations
