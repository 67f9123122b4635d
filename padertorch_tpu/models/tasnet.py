"""TasNet / DPRNN-TasNet / Conv-TasNet time-domain source separation.

Reference parity:
- ``contrib/examples/source_separation/tasnet/model.py:16`` (TasNet)
- ``contrib/examples/source_separation/tasnet/tas_coders.py``
  (TasEncoder/TasDecoder learned filterbanks, StftEncoder/IstftDecoder)

TPU-native input contract: padded batches —
``y``: (B, T) mixture, ``s``: (B, K, T) targets, ``num_samples``: (B,).
The PIT losses mask padded samples exactly (sums over valid samples only),
matching the reference's per-example slicing semantics.
"""
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from padertorch_tpu.base import Model
from padertorch_tpu.module import Module
from padertorch_tpu import nn
from padertorch_tpu.ops import STFT
from padertorch_tpu.ops.mappings import ACTIVATION_FN_MAP
from padertorch_tpu.ops.losses.source_separation import pit_loss
from padertorch_tpu.modules.dual_path_rnn import DPRNN
from padertorch_tpu.modules.dual_path_transformer import DualPathTransformer
from padertorch_tpu.modules.convnet import ConvNet

__all__ = ['TasNet', 'TasEncoder', 'TasDecoder', 'StftEncoder',
           'IstftDecoder']


class TasEncoder(Module):
    """Learned analysis filterbank: 1-D conv + ReLU (tas_coders.py:9)."""

    def __init__(self, window_length: int = 20, feature_size: int = 256,
                 stride: int = None, bias: bool = False):
        if stride is None:
            stride = window_length // 2
        self.window_length = window_length
        self.feature_size = feature_size
        self.stride = stride
        self.encoder_1d = nn.Conv1d(
            1, feature_size, window_length, stride=stride, padding=0,
            bias=bias)

    def forward(self, x, sequence_lengths=None):
        """(B, T) -> ((B, N, T_enc), encoded_sequence_lengths)."""
        assert x.ndim in (1, 2), x.shape
        if x.ndim == 1:
            x = x[None]
        length = x.shape[-1]
        hop = self.window_length // 2
        sq_offset = -1
        if length % hop > 0:
            x = jnp.pad(x, ((0, 0), (0, hop - (length % hop))))
            sq_offset = 0
        if sequence_lengths is not None:
            sequence_lengths = jnp.asarray(sequence_lengths) // hop \
                + sq_offset
        w = jax.nn.relu(self.encoder_1d(x[:, None, :]))
        return w, sequence_lengths


class TasDecoder(Module):
    """Learned synthesis filterbank: transposed 1-D conv (tas_coders.py:92)."""

    def __init__(self, window_length: int = 20, feature_size: int = 256,
                 stride: int = None, bias=False):
        if stride is None:
            stride = window_length // 2
        self.window_length = window_length
        self.feature_size = feature_size
        self.stride = stride
        self.decoder_1d = nn.ConvTranspose1d(
            feature_size, 1, kernel_size=window_length, stride=stride,
            bias=bias)

    def forward(self, w):
        """(B, N, T_enc) -> (B, T)."""
        return self.decoder_1d(w)[:, 0, :]


class StftEncoder(Module):
    """STFT-based encoder variant (tas_coders.py:138)."""

    def __init__(self, window_length: int = 20, feature_size: int = 256,
                 stride: int = None):
        self.window_length = window_length
        self.feature_size = feature_size
        if stride is None:
            stride = window_length // 2
        self.stride = stride
        self.stft = STFT(
            size=feature_size - 2, shift=stride,
            window_length=window_length, fading=False,
            complex_representation='concat')

    def forward(self, inputs, sequence_lengths=None):
        encoded = self.stft(inputs)
        encoded = jnp.swapaxes(encoded, -1, -2)  # (..., fbins, frames)
        if sequence_lengths is not None:
            # traceable samples->frames (pad=True, fading=False)
            n = jnp.asarray(sequence_lengths)
            wl, sh = self.window_length, self.stride
            num_frames = jnp.maximum(1, (n - wl + 2 * sh - 1) // sh)
            return encoded, num_frames
        return encoded, None


class IstftDecoder(Module):
    """iSTFT-based decoder variant (tas_coders.py:195)."""

    def __init__(self, window_length: int = 20, feature_size: int = 256,
                 stride: int = None):
        self.window_length = window_length
        self.feature_size = feature_size
        if stride is None:
            stride = window_length // 2
        self.stride = stride
        self.stft = STFT(
            size=feature_size - 2, shift=stride,
            window_length=window_length, fading=False,
            complex_representation='concat')

    def forward(self, stft_signal):
        return self.stft.inverse(jnp.swapaxes(stft_signal, -1, -2))


def _masked_si_sdr(estimate, target, mask):
    """SI-SDR on masked signals: exact under zero padding (sum-based)."""
    estimate = estimate * mask
    target = target * mask
    alpha = (jnp.sum(estimate * target, -1, keepdims=True)
             / jnp.maximum(jnp.sum(target * target, -1, keepdims=True),
                           1e-10))
    s_t = alpha * target
    num = jnp.sum(s_t * s_t, -1)
    den = jnp.sum((estimate - s_t) ** 2, -1)
    return -jnp.mean(10 * jnp.log10(num / jnp.maximum(den, 1e-10)))


def _masked_log_mse(estimate, target, mask, n_valid):
    mse = jnp.sum(((estimate - target) * mask) ** 2, -1) / n_valid
    return jnp.sum(jnp.log10(jnp.maximum(mse, 1e-12)))


def _masked_log1p_mse(estimate, target, mask, n_valid):
    mse = jnp.sum(((estimate - target) * mask) ** 2, -1) / n_valid
    return jnp.sum(jnp.log10(1 + mse))


class TasNet(Model):
    """Time-domain separator: encoder -> separator (DPRNN/TCN) -> decoder.

    forward input: dict with ``y`` (B, T), ``num_samples`` (B,);
    review additionally uses ``s`` (B, K, T).
    """

    @classmethod
    def finalize_dogmatic_config(cls, config):
        config['encoder'] = {'factory': TasEncoder}
        config['separator'] = {'factory': DPRNN}
        if config['separator']['factory'] == DPRNN:
            config['separator'].update(
                input_size=64, rnn_size=128, window_length=100,
                hop_size=50, num_blocks=6)
        elif config['separator']['factory'] == ConvNet:
            config['separator']['input_size'] = 256
        elif config['separator']['factory'] == DualPathTransformer:
            config['separator'].update(
                input_size=128, window_length=100, hop_size=50,
                num_blocks=4, num_layers_intra=2, num_layers_inter=2,
                num_heads=8)
        config['decoder'] = {'factory': TasDecoder}
        if config['encoder']['factory'] == TasEncoder:
            config['decoder']['window_length'] = \
                config['encoder']['window_length']
            config['decoder']['feature_size'] = \
                config['encoder']['feature_size']

    def __init__(
            self,
            encoder: Module,
            separator: Module,
            decoder: Module,
            mask: bool = True,
            output_nonlinearity: Optional[str] = 'sigmoid',
            num_speakers: int = 2,
            additional_out_size: int = 0,
            sample_rate: int = 8000,
    ):
        assert not mask or encoder.feature_size == decoder.feature_size, (
            'Encoder and decoder feature sizes must match when masking!')
        self.encoder = encoder
        self.separator = separator
        self.decoder = decoder
        self.mask = mask
        self.output_nonlinearity = ACTIVATION_FN_MAP[output_nonlinearity]()
        self.num_speakers = num_speakers
        self.additional_out_size = additional_out_size
        self.sample_rate = sample_rate

        self.encoded_input_norm = nn.LayerNorm(encoder.feature_size)
        self.input_proj = nn.Conv1d(
            encoder.feature_size, separator.input_size, 1)
        self.output_prelu = nn.PReLU()
        self.output_proj = nn.Conv1d(
            separator.hidden_size,
            decoder.feature_size * num_speakers + additional_out_size, 1)

    def forward(self, batch: dict) -> dict:
        sequence = batch['y']
        if sequence.ndim == 1:
            sequence = sequence[None]
        sequence_lengths = batch.get('num_samples')

        encoded_raw, encoded_sequence_lengths = self.encoder(
            sequence, sequence_lengths)

        encoded = jnp.swapaxes(encoded_raw, 1, 2)  # b n l -> b l n
        encoded = self.encoded_input_norm(encoded)

        encoded = jnp.swapaxes(encoded, 1, 2)
        encoded = self.input_proj(encoded)
        encoded = jnp.swapaxes(encoded, 1, 2)

        processed = self.separator(encoded, encoded_sequence_lengths)
        processed = jnp.swapaxes(processed, 1, 2)  # b l n -> b n l

        processed = self.output_proj(self.output_prelu(processed))

        if self.additional_out_size > 0:
            additional_out = processed[..., :self.additional_out_size, :]
            processed = processed[..., self.additional_out_size:, :]

        # (K, B, N, L)
        processed = jnp.stack(
            jnp.split(processed, self.num_speakers, axis=1))
        processed = self.output_nonlinearity(processed)
        processed = processed[..., :encoded_raw.shape[-1]]

        if self.mask:
            processed = encoded_raw[None] * processed

        k, b = processed.shape[0], processed.shape[1]
        decoded = self.decoder(
            processed.reshape(k * b, *processed.shape[2:]))
        decoded = decoded.reshape(k, b, -1)
        decoded = decoded[..., :sequence.shape[-1]]
        # offset-invariance fix (see reference model.py:139)
        decoded = decoded - jnp.mean(decoded, axis=-1, keepdims=True)

        out = {
            'out': jnp.swapaxes(decoded, 0, 1),  # (B, K, T)
            'encoded': jnp.swapaxes(encoded_raw, 1, 2),
            'encoded_out': jnp.transpose(processed, (1, 0, 3, 2)),
            'encoded_sequence_lengths': encoded_sequence_lengths,
        }
        if self.additional_out_size > 0:
            out['additional_out'] = additional_out
        return out

    def loss(self, inputs: dict, outputs: dict) -> dict:
        s = inputs['s']  # (B, K, T)
        x = outputs['out']  # (B, K, T)
        num_samples = jnp.asarray(inputs.get(
            'num_samples', jnp.full((s.shape[0],), s.shape[-1])))
        t = x.shape[-1]

        def per_example(est, tgt, n):
            mask = (jnp.arange(t) < n).astype(est.dtype)[None, :]
            return {
                'si-sdr': pit_loss(
                    est, tgt, axis=0,
                    loss_fn=lambda e, tg: _masked_si_sdr(e, tg, mask)),
                'log-mse': pit_loss(
                    est, tgt, axis=0,
                    loss_fn=lambda e, tg: _masked_log_mse(e, tg, mask, n)),
                'log1p-mse': pit_loss(
                    est, tgt, axis=0,
                    loss_fn=lambda e, tg: _masked_log1p_mse(
                        e, tg, mask, n)),
            }

        losses = jax.vmap(per_example)(x, s, num_samples)
        return {k: jnp.mean(v) for k, v in losses.items()}

    def review(self, inputs: dict, outputs: dict) -> dict:
        review = dict(losses=self.loss(inputs, outputs))
        if self.create_snapshot:
            # Raw device arrays (jit-safe); modify_summary turns them into
            # normalized audio snippets host-side.
            snapshots = {'observation': inputs['y'][0]}
            for i in range(outputs['out'].shape[1]):
                snapshots[f'estimate/{i}'] = outputs['out'][0, i]
            for i in range(inputs['s'].shape[1]):
                snapshots[f'target/{i}'] = inputs['s'][0, i]
            review['snapshots'] = snapshots
        return review

    def modify_summary(self, summary):
        from padertorch_tpu.summary.tbx_utils import audio
        snapshots = summary['snapshots']
        for key in list(snapshots):
            summary['audios'][key] = audio(
                snapshots.pop(key), sampling_rate=self.sample_rate)
        return super().modify_summary(summary)
