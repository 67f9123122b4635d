"""Blind source separation models: uPIT BLSTM and Deep Clustering.

Reference parity:
- ``padertorch/contrib/examples/source_separation/pit/model.py:11``
  (PermutationInvariantTrainingModel, Kolbaek 2017)
- ``padertorch/contrib/tcl/dc.py:8`` (DeepClusteringModel, Hershey 2016)

TPU-native input contract: instead of lists of variable-length tensors
(PackedSequence), batches are padded arrays plus a ``num_frames`` length
vector — one static shape per length bucket, one XLA program per bucket.
The losses mask padded frames so the numerics match the reference's
packed-sequence semantics (mean over valid frames per example, then mean
over the batch).
"""
import jax
import jax.numpy as jnp

from padertorch_tpu.base import Model
from padertorch_tpu import nn
from padertorch_tpu.modules.recurrent import LSTM
from padertorch_tpu.ops.mappings import ACTIVATION_FN_MAP
from padertorch_tpu.ops.losses.source_separation import (
    pit_loss, deep_clustering_loss,
)

__all__ = ['PermutationInvariantTrainingModel', 'DeepClusteringModel']


def _masked_pit_mse(estimate, target, num_frames):
    """Per-example PIT MSE over valid frames; vmapped over the batch.

    estimate/target: (B, T, K, F); num_frames: (B,).
    Equals the reference's per-example ``pit_loss(..., axis=-2)`` over
    unpadded tensors, averaged over the batch.
    """
    t = estimate.shape[1]

    def per_example(est, tgt, n):
        mask = (jnp.arange(t) < n).astype(est.dtype)[:, None, None]
        denom = n * est.shape[1] * est.shape[2]

        def loss_fn(e, tg):
            return jnp.sum((e - tg) ** 2 * mask) / denom

        return pit_loss(est, tgt, axis=1, loss_fn=loss_fn)

    return jnp.mean(jax.vmap(per_example)(
        estimate, target, jnp.asarray(num_frames)))


class PermutationInvariantTrainingModel(Model):
    """uPIT BLSTM mask estimator (K speakers, F frequency bins).

    forward input: dict with
      - ``Y_abs``: (B, T, F) magnitude spectrogram of the mixture
      - ``num_frames``: (B,) valid frame counts
    review additionally uses
      - ``X_abs``: (B, T, K, F) speaker magnitudes
      - ``cos_phase_difference``: (B, T, K, F) for the phase-sensitive loss
    """

    def __init__(
            self,
            F=257,
            recurrent_layers=3,
            units=600,
            K=2,
            dropout_input=0.,
            dropout_hidden=0.,
            dropout_linear=0.,
            output_activation='relu',
            compute_dtype=None,
            round_hidden_to_mxu=False,
    ):
        """``round_hidden_to_mxu=True`` runs the BLSTM at the 128-lane-
        aligned hidden width with structurally-zero padding (numerically
        identical, better MXU tiling — doc/performance.md "MXU
        tiling")."""
        self.K = K
        self.F = F
        assert dropout_input <= 0.5, dropout_input
        self.dropout_input = nn.Dropout(dropout_input)
        assert dropout_hidden <= 0.5, dropout_hidden
        self.blstm = LSTM(
            F, units, num_layers=recurrent_layers, bidirectional=True,
            dropout=dropout_hidden, compute_dtype=compute_dtype,
            round_hidden_to_mxu=round_hidden_to_mxu,
        )
        assert dropout_linear <= 0.5, dropout_linear
        self.dropout_linear = nn.Dropout(dropout_linear)
        self.relu = nn.ReLU()
        self.linear1 = nn.Linear(2 * units, 2 * units)
        self.linear2 = nn.Linear(2 * units, F * K)
        self.output_activation = ACTIVATION_FN_MAP[output_activation]()

    def forward(self, batch):
        """Returns masks of shape (B, T, K, F)."""
        y = batch['Y_abs']
        b, t, f = y.shape
        assert f == self.F, f'self.F = {self.F} != F = {f}'
        num_frames = batch.get('num_frames')
        h = self.dropout_input(y)
        h = jnp.log1p(h)
        h, _ = self.blstm(h, seq_lens=num_frames)
        h = self.dropout_linear(h)
        h = self.relu(self.linear1(h))
        h = self.output_activation(self.linear2(h))
        return h.reshape(b, t, self.K, self.F)

    def review(self, batch, model_out):
        observation = batch['Y_abs'][:, :, None, :]  # (B, T, 1, F)
        target = batch['X_abs']
        num_frames = batch.get(
            'num_frames',
            jnp.full((target.shape[0],), target.shape[1]))
        estimate = model_out * observation
        pit_mse = _masked_pit_mse(estimate, target, num_frames)
        pit_ips = _masked_pit_mse(
            estimate, target * batch['cos_phase_difference'], num_frames)
        review = dict(losses={
            'pit_mse_loss': pit_mse,
            'pit_ips_loss': pit_ips,
        })
        if self.create_snapshot:
            # Raw device arrays here (jit-safe); modify_summary converts
            # them to images host-side (the reference's snapshot pattern,
            # base.py:300-306).
            b = 0
            snapshots = {'observation': batch['Y_abs'][b]}
            for i in range(model_out.shape[2]):
                snapshots[f'mask_{i}'] = model_out[b, :, i, :]
                snapshots[f'estimation_{i}'] = estimate[b, :, i, :]
            review['snapshots'] = snapshots
        return review

    def modify_summary(self, summary):
        from padertorch_tpu.summary.tbx_utils import (
            stft_to_image, mask_to_image,
        )
        snapshots = summary['snapshots']
        for key in list(snapshots):
            value = snapshots.pop(key)
            if key.startswith('mask'):
                summary['images'][key] = mask_to_image(value)
            else:
                summary['images'][key] = stft_to_image(value)
        return super().modify_summary(summary)


class DeepClusteringModel(Model):
    """BLSTM deep-clustering embedding model.

    forward input: dict with ``Y_abs`` (B, T, F) and ``num_frames`` (B,);
    review uses ``target_mask`` (B, T, K, F).
    Returns embeddings (B, T, E, F), unit-norm over E.
    """

    def __init__(
            self,
            F=257,
            recurrent_layers=2,
            units=600,
            E=20,
            input_feature_transform='identity',
    ):
        self.E = E
        self.F = F
        self.input_feature_transform = input_feature_transform
        self.blstm = LSTM(
            F, units, num_layers=recurrent_layers, bidirectional=True)
        self.linear = nn.Linear(2 * units, F * E)

    def forward(self, batch):
        y = batch['Y_abs']
        b, t, f = y.shape
        assert f == self.F, f'self.F = {self.F} != F = {f}'
        if self.input_feature_transform == 'identity':
            h = y
        elif self.input_feature_transform == 'log1p':
            h = jnp.log1p(y)
        elif self.input_feature_transform == 'log':
            h = jnp.log(y + 1e-10)
        else:
            raise NotImplementedError(self.input_feature_transform)
        h, _ = self.blstm(h, seq_lens=batch.get('num_frames'))
        h = self.linear(h).reshape(b, t, self.E, self.F)
        # Hershey 2016: unit norm over the embedding axis
        h = h / jnp.maximum(
            jnp.linalg.norm(h, axis=2, keepdims=True), 1e-12)
        return h

    def review(self, batch, model_out):
        target_mask = batch['target_mask']
        num_frames = jnp.asarray(batch.get(
            'num_frames',
            jnp.full((target_mask.shape[0],), target_mask.shape[1])))
        t = model_out.shape[1]

        def per_example(embedding, mask, n):
            # (T, E, F) -> (T*F, E); zero padded frames contribute zero
            # rows to every term, but the N^2 normalization must count
            # only valid frames.
            valid = (jnp.arange(t) < n).astype(
                embedding.dtype)[:, None, None]
            e = jnp.swapaxes(embedding * valid, 1, 2).reshape(
                -1, embedding.shape[1])
            m = jnp.swapaxes(mask * valid, 1, 2).reshape(
                -1, mask.shape[1])
            n_valid = n * embedding.shape[-1]
            raw = deep_clustering_loss(e, m)
            # deep_clustering_loss normalizes by (T*F)^2; fix to valid^2
            return raw * (e.shape[0] ** 2) / (n_valid ** 2)

        dc = jnp.mean(jax.vmap(per_example)(
            model_out, target_mask, num_frames))
        return {'losses': {'dc_loss': dc}}
