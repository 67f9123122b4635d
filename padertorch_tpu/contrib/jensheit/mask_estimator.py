"""Configurable mask estimator module + model (pb_bss-style).

Reference parity: ``padertorch/contrib/jensheit/mask_estimator_example/``
(``modul.py`` MaskEstimator + ``model.py`` MaskEstimatorModel) — a
Normalization + BLSTM + FF stack predicting speech/noise masks, with the
MaskKeys vocabulary used across the jensheit recipes.
"""
import jax
import jax.numpy as jnp

from padertorch_tpu.base import Model, Module
from padertorch_tpu import nn
from padertorch_tpu.modules.normalization import Normalization
from padertorch_tpu.modules.recurrent import LSTM
from padertorch_tpu.models.mask_estimator import binary_cross_entropy

__all__ = ['MaskKeys', 'MaskLossKeys', 'MaskEstimator',
           'MaskEstimatorModel', 'maybe_remove_channel']


class MaskKeys:
    SPEECH_MASK_PRED = 'speech_mask_prediction'
    NOISE_MASK_PRED = 'noise_mask_prediction'
    SPEECH_MASK_TARGET = 'speech_mask_target'
    NOISE_MASK_TARGET = 'noise_mask_target'
    OBSERVATION_STFT = 'observation_stft'
    OBSERVATION_ABS = 'observation_abs'
    SPEECH_PRED = 'speech_prediction'
    MASK_ESTIMATOR_STATE = 'mask_estimator_state'


class MaskLossKeys:
    """Loss-name vocabulary for mask-estimator reviews (reference
    ``mask_estimator_example/model.py:18``)."""
    NOISE_MASK = 'noise_mask_loss'
    SPEECH_MASK = 'speech_mask_loss'
    WEIGHTED_NOISE_MASK = 'power_weighted_noise_mask_loss'
    WEIGHTED_SPEECH_MASK = 'power_weighted_speech_mask_loss'
    MASK = 'mask_loss'
    WEIGHTED_MASK = 'power_weighted_mask_loss'
    TOTAL_MASK = 'total_mask_loss'
    VAD = 'VAD_loss'
    REC = 'reconstruction_loss'


M_K = MaskKeys


def maybe_remove_channel(signal, exp_dim=1, ref_channel=0):
    """Drop a leading channel axis if present (reference
    ``mask_estimator_example/model.py:239``): single-channel recipes
    accept both (C, ...) multi-channel and (...) single-channel
    arrays.  Works on numpy and jax arrays.
    """
    dim = signal.ndim
    if dim == exp_dim + 1:
        assert signal.shape[0] < 20, (
            f'The first dim is supposed to be the channel dimension, '
            f'however the shape is {signal.shape}')
        return signal[ref_channel]
    elif dim == exp_dim:
        return signal
    raise ValueError(
        f'Either the signal has ndim {exp_dim} or {exp_dim + 1}',
        signal.shape)


class MaskEstimator(Module):
    """Norm + BLSTM + FF -> (speech_mask, noise_mask).

    Reference parity: ``jensheit/mask_estimator_example/modul.py:45``.
    """

    @classmethod
    def finalize_dogmatic_config(cls, config):
        config['num_features'] = 513

    def __init__(self, num_features=513, num_units=512, dropout=0.5,
                 recurrent_layers=1, bidirectional=True):
        self.num_features = num_features
        self.norm = Normalization(
            'btf', (1, 1, num_features), statistics_axis='t',
            independent_axis='f', batch_axis='b', sequence_axis='t')
        self.rnn = LSTM(
            num_features, num_units, num_layers=recurrent_layers,
            bidirectional=bidirectional)
        rnn_out = num_units * (2 if bidirectional else 1)
        self.dropout = nn.Dropout(dropout)
        self.ff = nn.Linear(rnn_out, num_units)
        self.out = nn.Linear(num_units, 2 * num_features)

    def forward(self, x, num_frames=None):
        """x: (B, T, F) magnitudes -> dict of (B, T, F) masks."""
        h = self.norm(x, sequence_lengths=num_frames)
        h, _ = self.rnn(h, seq_lens=num_frames)
        h = jax.nn.relu(self.ff(self.dropout(h)))
        masks = jax.nn.sigmoid(self.out(h))
        return {
            M_K.SPEECH_MASK_PRED: masks[..., :self.num_features],
            M_K.NOISE_MASK_PRED: masks[..., self.num_features:],
        }


class MaskEstimatorModel(Model):
    """Reference parity: ``jensheit/mask_estimator_example/model.py:30``."""

    @classmethod
    def finalize_dogmatic_config(cls, config):
        config['estimator'] = {'factory': MaskEstimator}

    def __init__(self, estimator):
        self.estimator = estimator

    def forward(self, batch):
        return self.estimator(
            batch[M_K.OBSERVATION_ABS], batch.get('num_frames'))

    def review(self, batch, output):
        speech_loss = binary_cross_entropy(
            output[M_K.SPEECH_MASK_PRED], batch[M_K.SPEECH_MASK_TARGET])
        noise_loss = binary_cross_entropy(
            output[M_K.NOISE_MASK_PRED], batch[M_K.NOISE_MASK_TARGET])
        review = dict(losses={
            'speech_mask_loss': speech_loss,
            'noise_mask_loss': noise_loss,
        })
        if self.create_snapshot:
            review['snapshots'] = {
                'speech_mask': output[M_K.SPEECH_MASK_PRED][0],
                'observation': batch[M_K.OBSERVATION_ABS][0],
            }
        return review

    def modify_summary(self, summary):
        from padertorch_tpu.summary.tbx_utils import (
            mask_to_image, stft_to_image,
        )
        for key in list(summary['snapshots']):
            value = summary['snapshots'].pop(key)
            if 'mask' in key:
                summary['images'][key] = mask_to_image(value)
            else:
                summary['images'][key] = stft_to_image(value)
        return super().modify_summary(summary)
