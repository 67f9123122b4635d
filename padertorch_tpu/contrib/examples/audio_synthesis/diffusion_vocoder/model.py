"""Diffusion (DDPM) mel-to-wave vocoder, DiffWave-style.

Beyond-reference capability: fgnt/padertorch ships autoregressive
(WaveNet) and GAN-wrapped vocoders; this recipe trains a score-based
one on the framework's diffusion primitives (``ops/diffusion.py``) —
the third major neural-vocoder family.

Architecture (compact DiffWave, Kong et al. 2021): the noisy waveform
enters a non-causal dilated residual stack; log-mel conditioning is
upsampled to sample rate with exact-rate transposed convs (the GAN
vocoder's trick) and added inside each gated block; the diffusion step
enters as a sinusoidal embedding -> MLP, broadcast-added per block.

TPU notes: training draws one uniform timestep per example so a batch
covers the schedule (standard DDPM practice) and jits into ONE program;
synthesis runs the whole reverse process (DDPM or strided DDIM) as one
``lax.scan`` — a 50-step synthesis is a single XLA program, no host
round-trips.
"""
import math

import jax
import jax.numpy as jnp

from padertorch_tpu import nn
from padertorch_tpu import random as ptrandom
from padertorch_tpu.base import Model
from padertorch_tpu.module import Module
from padertorch_tpu.ops.diffusion import (
    DiffusionSchedule, q_sample, ddpm_sample, ddim_sample,
    timestep_embedding,
)

__all__ = ['DiffWaveDenoiser', 'DiffusionVocoder']


def _swish(x):
    return x * jax.nn.sigmoid(x)


class _ResidualBlock(Module):
    """Gated dilated conv block with step + mel conditioning."""

    def __init__(self, channels, cond_channels, dilation, t_dim):
        self.dilated = nn.Conv1d(
            channels, 2 * channels, 3, dilation=dilation,
            padding=dilation)
        self.cond_proj = nn.Conv1d(cond_channels, 2 * channels, 1)
        self.t_proj = nn.Linear(t_dim, channels)
        self.out_proj = nn.Conv1d(channels, 2 * channels, 1)
        self.channels = channels

    def forward(self, x, cond, t_emb):
        # x: (B, C, T), cond: (B, Cc, T), t_emb: (B, t_dim)
        h = x + self.t_proj(t_emb)[:, :, None]
        h = self.dilated(h) + self.cond_proj(cond)
        gate, filt = jnp.split(h, 2, axis=1)
        h = jax.nn.sigmoid(gate) * jnp.tanh(filt)
        h = self.out_proj(h)
        residual, skip = jnp.split(h, 2, axis=1)
        return (x + residual) / math.sqrt(2.0), skip


class DiffWaveDenoiser(Module):
    """eps(x_t, mel, t) network.

    Args:
        n_mels: conditioning channels.
        channels: residual width.
        num_layers: dilated blocks; dilation cycles ``2**(i % cycle)``.
        cycle: dilation cycle length.
        upsample_rates: per-stage mel upsampling (product = hop length).
        t_dim: diffusion-step embedding width.
    """

    def __init__(self, n_mels=80, channels=64, num_layers=12, cycle=6,
                 upsample_rates=(5, 5, 4, 2), t_dim=128):
        self.n_mels = n_mels
        self.t_dim = t_dim
        self.upsample_rates = tuple(upsample_rates)
        self.input_proj = nn.Conv1d(1, channels, 1)
        # exact-rate mel upsampling (same length formula as the GAN
        # vocoder generator: k - r even -> p = (k - r)/2 integral)
        ups = []
        for r in self.upsample_rates:
            k = 2 * r if r % 2 == 0 else 2 * r + 1
            ups.append(nn.ConvTranspose1d(
                n_mels, n_mels, k, stride=r, padding=(k - r) // 2))
        self.upsample = ups
        self.t_mlp = [nn.Linear(t_dim, t_dim), nn.Linear(t_dim, t_dim)]
        self.blocks = [
            _ResidualBlock(channels, n_mels, 2 ** (i % cycle), t_dim)
            for i in range(num_layers)
        ]
        self.skip_proj = nn.Conv1d(channels, channels, 1)
        out = nn.Conv1d(channels, 1, 1)
        # zero-init the output so training starts at eps_hat = 0
        out.weight = jnp.zeros_like(out.weight)
        if getattr(out, 'bias', None) is not None:
            out.bias = jnp.zeros_like(out.bias)
        self.output_proj = out

    @property
    def hop_length(self):
        hop = 1
        for r in self.upsample_rates:
            hop *= r
        return hop

    def upsample_cond(self, mel):
        """(B, M, frames) -> (B, M, frames * hop)."""
        c = mel
        for up in self.upsample:
            c = jax.nn.leaky_relu(up(c), 0.4)
        return c

    def forward(self, noisy, mel, t, cond=None):
        """noisy: (B, T), mel: (B, M, frames), t: (B,) int32 -> (B, T).

        ``cond`` short-circuits the mel upsampling with a precomputed
        conditioner (synthesis computes it once outside the scan).
        """
        if cond is None:
            cond = self.upsample_cond(mel)
        x = _swish(self.input_proj(noisy[:, None, :]))
        t_emb = timestep_embedding(t, self.t_dim)
        for lin in self.t_mlp:
            t_emb = _swish(lin(t_emb))
        t_len = x.shape[-1]
        cond = cond[..., :t_len]
        skips = 0.0
        for block in self.blocks:
            x, skip = block(x, cond, t_emb)
            skips = skips + skip
        h = skips / math.sqrt(len(self.blocks))
        h = jax.nn.relu(self.skip_proj(h))
        return self.output_proj(h)[:, 0, :]


class DiffusionVocoder(Model):
    """DDPM vocoder: train with the eps-prediction MSE, synthesize with
    ancestral DDPM or strided DDIM sampling (both one ``lax.scan``).
    """

    @classmethod
    def finalize_dogmatic_config(cls, config):
        config['denoiser'] = {'factory': DiffWaveDenoiser}

    def __init__(self, denoiser=None, num_steps=50,
                 schedule_kind='linear', beta_start=1e-4, beta_end=0.05,
                 sample_rate=16000):
        self.denoiser = (denoiser if denoiser is not None
                         else DiffWaveDenoiser())
        self.num_steps = num_steps
        self.schedule_kind = schedule_kind
        self.beta_start = beta_start
        self.beta_end = beta_end
        self.sample_rate = sample_rate

    @property
    def schedule(self):
        # rebuilt from static hyperparameters on demand: tiny host-side
        # numpy work; under jit the arrays become compiled constants
        # (keeping them out of the pytree leaves)
        return DiffusionSchedule(
            self.num_steps, kind=self.schedule_kind,
            beta_start=self.beta_start, beta_end=self.beta_end)

    def forward(self, inputs):
        audio = jnp.asarray(inputs['audio_data'])
        mel = jnp.asarray(inputs['features'])
        schedule = self.schedule
        b = audio.shape[0]
        # one uniform timestep per example: a batch covers the schedule
        t = jax.random.randint(
            ptrandom.next_key(), (b,), 0, schedule.num_steps)
        noise = jax.random.normal(ptrandom.next_key(), audio.shape)
        noisy = q_sample(audio, t, noise, schedule)
        t_len = min(
            noisy.shape[-1], mel.shape[-1] * self.denoiser.hop_length)
        eps_hat = self.denoiser(noisy[..., :t_len], mel, t)
        return {'eps_hat': eps_hat, 'eps': noise[..., :t_len], 't': t}

    def review(self, inputs, outputs):
        err = outputs['eps_hat'] - outputs['eps']
        loss = jnp.mean(jnp.square(err))
        review = {
            'loss': loss,
            'scalars': {
                'eps_mae': jnp.mean(jnp.abs(err)),
                'mean_t': jnp.mean(outputs['t'].astype('float32')),
            },
        }
        return review

    def synthesize(self, mel, key=None, num_steps=None, ddim=False):
        """Mel (B, M, frames) -> waveform (B, frames * hop).

        ``ddim=True`` uses the deterministic strided sampler with
        ``num_steps`` network evaluations (default: the full schedule).
        The conditioner is upsampled ONCE outside the scan.
        """
        model = self.eval()
        if key is None:
            key = jax.random.PRNGKey(0)
        schedule = model.schedule
        cond = model.denoiser.upsample_cond(jnp.asarray(mel))
        shape = (cond.shape[0], cond.shape[-1])

        def eps_fn(x_t, t):
            tb = jnp.broadcast_to(t, (x_t.shape[0],))
            return model.denoiser(x_t, None, tb, cond=cond)

        if ddim:
            return ddim_sample(
                eps_fn, shape, schedule, key, num_steps=num_steps,
                eta=0.0, clip=(-1.0, 1.0))
        return ddpm_sample(eps_fn, shape, schedule, key,
                           clip=(-1.0, 1.0))
