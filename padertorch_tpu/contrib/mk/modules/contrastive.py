"""Contrastive predictive coding (CPC).

Reference parity: ``padertorch/contrib/mk/modules/contrastive.py``
(``CPC1d``, van den Oord 2018): a convolutional encoder produces latents
z, an autoregressive context network produces c, and per prediction step
k a bilinear head scores z_{t+k} against c_t with an InfoNCE loss over
in-batch negatives.
"""
import jax
import jax.numpy as jnp

from padertorch_tpu.base import Model
from padertorch_tpu import nn
from padertorch_tpu.modules.recurrent import GRU

__all__ = ['CPC1d']


class CPC1d(Model):
    """CPC over (B, C, T) inputs (e.g. waveform windows or features)."""

    def __init__(self, encoder=None, context_size=128, latent_size=64,
                 in_channels=1, prediction_steps=4):
        if encoder is None:
            encoder = nn.Sequential(
                nn.Conv1d(in_channels, latent_size, 10, stride=5,
                          padding=3),
                nn.ReLU(),
                nn.Conv1d(latent_size, latent_size, 8, stride=4,
                          padding=2),
                nn.ReLU(),
                nn.Conv1d(latent_size, latent_size, 4, stride=2,
                          padding=1),
                nn.ReLU(),
            )
        self.encoder = encoder
        self.context = GRU(latent_size, context_size)
        self.heads = [
            nn.Linear(context_size, latent_size, bias=False)
            for _ in range(prediction_steps)
        ]
        self.prediction_steps = prediction_steps

    def forward(self, inputs):
        x = inputs['audio_data']
        if x.ndim == 2:
            x = x[:, None, :]
        z = self.encoder(x)               # (B, D, T')
        z = jnp.swapaxes(z, 1, 2)         # (B, T', D)
        c, _ = self.context(z)            # (B, T', C)
        return {'z': z, 'c': c}

    def review(self, inputs, outputs):
        z, c = outputs['z'], outputs['c']
        b, t, d = z.shape
        total_loss = 0.0
        total_acc = 0.0
        steps = 0
        for k, head in enumerate(self.heads, start=1):
            if t - k <= 1:
                continue
            pred = head(c[:, :t - k])        # (B, T-k, D)
            target = z[:, k:]                # (B, T-k, D)
            # InfoNCE with in-batch+in-time negatives per (b, t) anchor
            pred_f = pred.reshape(-1, d)
            target_f = target.reshape(-1, d)
            logits = pred_f @ target_f.T     # (N, N)
            labels = jnp.arange(logits.shape[0])
            logp = jax.nn.log_softmax(logits, axis=-1)
            loss = -jnp.mean(jnp.take_along_axis(
                logp, labels[:, None], axis=1))
            acc = jnp.mean(
                (jnp.argmax(logits, -1) == labels).astype('float32'))
            total_loss = total_loss + loss
            total_acc = total_acc + acc
            steps += 1
        return {
            'loss': total_loss / max(steps, 1),
            'scalars': {'infonce_accuracy': total_acc / max(steps, 1)},
        }
