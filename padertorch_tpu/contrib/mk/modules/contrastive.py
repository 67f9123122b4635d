"""Contrastive predictive coding (CPC).

Reference parity: ``padertorch/contrib/mk/modules/contrastive.py`` —
``CPC1d`` (van den Oord 2018) with the reference's full option surface:
forward AND backward prediction steps (lists), multi-view training,
temperature, l2 normalization, three negatives modes ('batch' with
same-label masking / inversion, 'time' with a
``negative_to_target_dist`` exclusion band, 'all'), hardest-negative
subsampling (``negative_ratio``), time masks, dot-product or cosine
similarity, ``get_posteriors`` and a frozen ``CPCFeatureExtractor``.

TPU notes: prediction steps are a static python list, so the per-step
slices unroll at trace time into static-shape XLA ops; the InfoNCE
similarities are batched einsums on the MXU; masked means replace the
reference's host-side ``Mean(axis=1)(x, seq_len)``.
"""
import numpy as np
import jax
import jax.numpy as jnp

from padertorch_tpu.base import Model
from padertorch_tpu.module import Module
from padertorch_tpu.ops.sequence.mask import compute_mask

__all__ = ['CPC1d', 'CPCFeatureExtractor', 'cosine_similarity',
           'repeat_interleaved', 'SIMILARITIES']

_NEG_INF = -1e30  # additive mask; finite to keep softmax grads clean


def repeat_interleaved(x, n):
    """Repeat each channel ``n`` times along axis 1 (reference
    ``contrastive.py:14``).

    >>> repeat_interleaved(jnp.arange(6.).reshape(1, 2, 3), 2).shape
    (1, 4, 3)
    """
    b, d, t = x.shape
    return jnp.broadcast_to(x[:, :, None, :], (b, d, n, t)).reshape(
        b, d * n, t)


def cosine_similarity(tensor, other, eps=1e-12):
    """Cosine similarity of (..., b, d) against (..., d, k)
    (reference ``contrastive.py:49``)."""
    prod = jnp.matmul(tensor, other)
    norm = (
        jnp.linalg.norm(tensor, axis=-1, keepdims=True)
        * jnp.linalg.norm(other, axis=-2, keepdims=True)
    )
    return prod / jnp.maximum(norm, eps)


SIMILARITIES = {
    'dot_product': jnp.matmul,
    'cosine': cosine_similarity,
}


def _l2_normalize(x, axis, eps=1e-3):
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(norm, eps)


def _masked_time_mean(values, seq_lens):
    """Mean over axis 1 of (B, T) restricted to ``seq_lens`` frames."""
    if seq_lens is None:
        return jnp.mean(values, axis=1)
    mask = compute_mask(values, seq_lens, batch_axis=0, sequence_axis=1)
    denom = jnp.maximum(jnp.sum(mask, axis=1), 1.0)
    return jnp.sum(values * mask, axis=1) / denom


class CPC1d(Model):
    """CPC over (B, D, T) feature sequences.

    Args (reference ``contrastive.py:74-261``):
        encoder: network g_enc mapping ``(x, seq_len) -> (z, seq_len_z)``
            (e.g. ``contrib.je.modules.conv.CNN1d``) or ``None``.
        fwd_projection_head: autoregressive g_ar producing the stacked
            step predictions ``(B, S*D, T)``; ``None`` scores the
            encoder output directly (repeated per step).
        bwd_projection_head: same, running over reversed time for the
            (negative) backward steps.
        feature_extractor: optional frontend ``(x, seq_len) -> ...``.
        fwd_prediction_steps: list of non-negative ints.
        bwd_prediction_steps: list of non-positive ints.
        multi_view: score predictions from view 1 against targets from
            view 2 (requires a second extractor or augmenting frontend).
        temperature, l2_normalization, similarity: scoring options.
        negatives_mode: 'batch' | 'time' | 'all'.
        negative_to_target_dist: for time/all negatives, exclude
            negatives closer than this many frames to the target.
        batch_mask_key: inputs key with per-example labels; negatives
            with the same label are masked out (or, with
            ``invert_batch_mask``, kept exclusively).
        time_mask_key: inputs key with a (B, T) 0/1 activity mask;
            loss/accuracy only where prediction and target frames are 1.
        negative_ratio: keep this quantile of hardest (lowest
            similarity) negatives, 'batch' mode.
    """

    def __init__(self, encoder=None, fwd_projection_head=None,
                 bwd_projection_head=None, feature_extractor=None, *,
                 fwd_prediction_steps=(1, 2, 3, 4),
                 bwd_prediction_steps=(),
                 multi_view=False, second_view_extractor=None,
                 temperature=1.0, l2_normalization=False,
                 negatives_mode='batch', negative_to_target_dist=0,
                 input_key='x', input_seq_len_key='seq_len_x',
                 prefix=None, similarity='dot_product',
                 batch_mask_key=None, time_mask_key=None,
                 invert_batch_mask=False, negative_ratio=1.0):
        fwd_prediction_steps = list(fwd_prediction_steps)
        bwd_prediction_steps = list(bwd_prediction_steps)
        assert len(fwd_prediction_steps) > 0
        assert all(s >= 0 for s in fwd_prediction_steps), \
            fwd_prediction_steps
        if bwd_prediction_steps:
            assert all(s <= 0 for s in bwd_prediction_steps), \
                bwd_prediction_steps
            assert not ((fwd_projection_head is None)
                        ^ (bwd_projection_head is None))
        assert negatives_mode in ('batch', 'time', 'all'), negatives_mode
        self.feature_extractor = feature_extractor
        self.encoder = encoder
        self.fwd_projection_head = fwd_projection_head
        self.bwd_projection_head = bwd_projection_head
        self.fwd_prediction_steps = sorted(fwd_prediction_steps)
        self.bwd_prediction_steps = sorted(bwd_prediction_steps)
        self.multi_view = multi_view
        self.second_view_extractor = second_view_extractor
        self.temperature = temperature
        self.l2_normalization = l2_normalization
        self.negatives_mode = negatives_mode
        self.negative_to_target_dist = negative_to_target_dist
        self.input_key = input_key
        self.input_seq_len_key = input_seq_len_key
        self.prefix = '' if prefix is None else prefix + '_'
        self.similarity = similarity
        self.batch_mask_key = batch_mask_key
        self.time_mask_key = time_mask_key
        self.invert_batch_mask = invert_batch_mask
        self.negative_ratio = negative_ratio

    @property
    def prediction_steps(self):
        return self.bwd_prediction_steps + self.fwd_prediction_steps

    # -- stages ----------------------------------------------------------

    def encode(self, x, seq_len_x, target_shape=None):
        """Frontend + encoder; under multi-view the second view's
        targets are concatenated along the batch axis (reference
        ``contrastive.py:276``)."""
        if self.multi_view:
            if self.second_view_extractor is not None:
                x_targets, seq_len_targets = self.second_view_extractor(
                    x, seq_len=seq_len_x)
            elif self.feature_extractor is not None:
                x_targets, seq_len_targets = self.feature_extractor(
                    x, seq_len=seq_len_x)
            else:
                raise ValueError(
                    'multi_view training requires two different views, '
                    'i.e. two separate feature_extractors or one '
                    'feature_extractor with data augmentation.')
        else:
            x_targets = seq_len_targets = None
        if self.feature_extractor is not None:
            x, seq_len_x = self.feature_extractor(x, seq_len=seq_len_x)
        if x_targets is not None:
            x = jnp.concatenate((x, x_targets), axis=0)
            seq_len_x = np.concatenate(
                (np.asarray(seq_len_x), np.asarray(seq_len_targets)))
        if x.ndim == 4:  # (B, D, F, T) -> (B, D*F, T)
            b, d, f, t = x.shape
            x = x.reshape(b, d * f, t)
        if self.encoder is None:
            z, seq_len_z = x, seq_len_x
        else:
            kwargs = {}
            if target_shape is not None:
                kwargs = dict(target_shape=target_shape)
                try:
                    z, seq_len_z = self.encoder(x, seq_len_x, **kwargs)
                except TypeError:
                    z, seq_len_z = self.encoder(x, seq_len_x)
            else:
                z, seq_len_z = self.encoder(x, seq_len_x)
        if z.ndim == 4:
            b, d, f, t = z.shape
            z = z.reshape(b, d * f, t)
        return x, z, seq_len_z

    def predict(self, z, seq_len_z):
        """Step predictions, stacked along channels: (B, S*D, T)
        (reference ``contrastive.py:314``)."""
        if self.fwd_projection_head is None:
            n = len(self.fwd_prediction_steps)
            z_hat = jnp.tile(z, (1, n, 1))
        else:
            z_hat, _ = self.fwd_projection_head(z, seq_len_z)
        if self.bwd_prediction_steps:
            if self.bwd_projection_head is None:
                n = len(self.bwd_prediction_steps)
                z_hat_bwd = jnp.tile(z, (1, n, 1))
            else:
                z_hat_bwd, _ = self.bwd_projection_head(z, seq_len_z)
            z_hat = jnp.concatenate((z_hat_bwd, z_hat), axis=1)
        return z_hat

    def _similarity(self, a, b):
        return SIMILARITIES[self.similarity](a, b)

    def _band_logmask(self, t):
        """(T, T) additive mask excluding negatives within
        ``negative_to_target_dist`` of the target (diagonal kept)."""
        if self.negative_to_target_dist <= 1:
            return None
        idx = jnp.arange(t)
        dist = jnp.abs(idx[:, None] - idx[None, :])
        near = (dist < self.negative_to_target_dist) & (dist > 0)
        return jnp.where(near, _NEG_INF, 0.0)

    def contrast(self, z_hat, z, batch_labels=None):
        """Similarity logits per prediction step + InfoNCE targets
        (reference ``contrastive.py:329``). Returns
        (list of (B, K, T_s) logits, (B or 1, 1 or T) targets)."""
        s = len(self.prediction_steps)
        b, d, t = z.shape
        if self.l2_normalization:
            z = _l2_normalize(z, axis=1)
            z_hat = z_hat.reshape(b, s, d, t)
            z_hat = _l2_normalize(z_hat, axis=2).reshape(b, s * d, t)
        assert z_hat.shape[1] == s * d, (z_hat.shape[1], s * d)

        logits = []
        if self.negatives_mode == 'batch':
            z_tdb = jnp.transpose(z, (2, 1, 0))          # (T, D, B)
            z_hat_tbd = jnp.transpose(z_hat, (2, 0, 1))  # (T, B, S*D)
            z_hat_steps = jnp.split(z_hat_tbd, s, axis=2)
            if batch_labels is not None:
                labels = np.asarray(batch_labels)
                batch_mask = labels[:, None] != labels[None, :]
                if self.invert_batch_mask:
                    batch_mask = ~batch_mask  # negatives w/ same label
                else:
                    batch_mask = batch_mask | np.eye(b, dtype=bool)
                log_batch_mask = jnp.where(
                    jnp.asarray(batch_mask), 0.0, _NEG_INF)[None]
            else:
                log_batch_mask = jnp.zeros((1, b, b))
            for step, z_hat_s in zip(self.prediction_steps, z_hat_steps):
                z_s = z_tdb
                if step < 0:
                    z_hat_s = z_hat_s[abs(step):]
                    z_s = z_s[:t - abs(step)]
                elif step > 0:
                    z_hat_s = z_hat_s[:t - step]
                    z_s = z_s[step:]
                sims = (self._similarity(z_hat_s, z_s) / self.temperature
                        + log_batch_mask)            # (T_s, B, B)
                if self.negative_ratio < 1.0:
                    # reference semantics: keep the quantile of
                    # negatives with lowest similarity (mask candidates
                    # strictly above the k-th largest; target kept)
                    k = max(int(np.ceil(b * (1 - self.negative_ratio))), 1)
                    th = jnp.min(
                        jax.lax.top_k(sims, k)[0], axis=2, keepdims=True)
                    keep = (sims <= th) | jnp.eye(b, dtype=bool)[None]
                    sims = sims + jnp.where(keep, 0.0, _NEG_INF)
                logits.append(jnp.transpose(sims, (1, 2, 0)))  # (B,K,T_s)
            targets = jnp.arange(b)[:, None]
        elif self.negatives_mode == 'time':
            z_hat_btd = jnp.transpose(z_hat, (0, 2, 1))  # (B, T, S*D)
            z_hat_steps = jnp.split(z_hat_btd, s, axis=2)
            logmask = self._band_logmask(t)
            for step, z_hat_s in zip(self.prediction_steps, z_hat_steps):
                z_s = z
                if step < 0:
                    z_hat_s = z_hat_s[:, abs(step):]
                elif step > 0:
                    z_hat_s = z_hat_s[:, :t - step]
                    z_s = jnp.roll(z_s, -step, axis=-1)
                sims = self._similarity(z_hat_s, z_s) / self.temperature
                out = jnp.transpose(sims, (0, 2, 1))     # (B, T, T_s)
                if logmask is not None:
                    out = out + logmask[..., :out.shape[-1]][None]
                logits.append(out)
            targets = jnp.arange(t)[None]
        else:  # 'all'
            z_dbt = jnp.transpose(z, (1, 0, 2))          # (D, B, T)
            z_hat_btd = jnp.transpose(z_hat, (0, 2, 1))
            z_hat_steps = jnp.split(z_hat_btd, s, axis=2)
            if self.negative_to_target_dist > 1:
                band = np.asarray(self._band_logmask(t))
                logmask = np.concatenate(
                    [band, np.zeros(((b - 1) * t, t))], axis=0)
                logmask = jnp.asarray(np.stack(
                    [np.roll(logmask, i * t, axis=0) for i in range(b)],
                    axis=0))
            else:
                logmask = None
            for step, z_hat_s in zip(self.prediction_steps, z_hat_steps):
                z_s = z_dbt
                if step < 0:
                    z_hat_s = z_hat_s[:, abs(step):]
                elif step > 0:
                    z_hat_s = z_hat_s[:, :t - step]
                    z_s = jnp.roll(z_s, -step, axis=2)
                flat = z_s.reshape(d, b * t)             # (D, B*T)
                sims = self._similarity(z_hat_s, flat) / self.temperature
                out = jnp.transpose(sims, (0, 2, 1))     # (B, B*T, T_s)
                if logmask is not None:
                    out = out + logmask[..., :out.shape[-1]]
                logits.append(out)
            targets = (jnp.arange(b)[:, None] * t + jnp.arange(t))
        return logits, targets

    # -- Model interface -------------------------------------------------

    def forward(self, inputs):
        x = inputs[self.input_key]
        seq_len = inputs.get(self.input_seq_len_key)
        x, z, seq_len_z = self.encode(
            x, seq_len_x=seq_len,
            target_shape=inputs.get(f'{self.prefix}target_shape'))
        if self.multi_view:
            z_, z = jnp.split(z, 2, axis=0)
            seq_len_z = (None if seq_len_z is None
                         else np.asarray(seq_len_z)[:z_.shape[0]])
            z_hat = self.predict(z_, seq_len_z)
        else:
            z_hat = self.predict(z, seq_len_z)
        batch_labels = (inputs[self.batch_mask_key]
                        if self.batch_mask_key is not None else None)
        logits, targets = self.contrast(z_hat, z, batch_labels)
        return logits, targets, seq_len_z, x

    def review(self, inputs, outputs):
        logits, targets, seq_len_z, x = outputs
        time_labels = (inputs[self.time_mask_key]
                       if self.time_mask_key is not None else None)
        if self.multi_view:
            x, x_targets = jnp.split(x, 2, axis=0)
        else:
            x_targets = x

        accuracies = {}
        negatives = {}
        ce = 0.0
        for step, logits_s in zip(self.prediction_steps, logits):
            t_s = logits_s.shape[2]
            seq_len_s = (None if seq_len_z is None
                         else np.maximum(
                             np.asarray(seq_len_z) - abs(step), 0))
            targets_s = jnp.broadcast_to(
                targets[:, :t_s], (logits_s.shape[0], t_s))
            logp = jax.nn.log_softmax(logits_s, axis=1)
            ce_s = -jnp.take_along_axis(
                logp, targets_s[:, None, :], axis=1)[:, 0]   # (B, T_s)
            hits = (jnp.argmax(
                jax.lax.stop_gradient(logits_s), axis=1) == targets_s
            ).astype('float32')
            if time_labels is not None:
                tl = jnp.asarray(time_labels)
                time_mask = (
                    tl[:, :tl.shape[1] - abs(step)]
                    * tl[:, abs(step):])[:, :t_s].astype('float32')
                ce_s = ce_s * time_mask
                hits = hits * time_mask
                lens = (np.asarray(seq_len_s, 'float64')
                        if seq_len_s is not None else float(t_s))
                accuracy_correction = lens / (
                    jnp.sum(time_mask, axis=1) + 1)
                active = jnp.maximum(
                    jnp.sum(jnp.sum(time_mask, axis=1) > 0), 1)
            else:
                accuracy_correction = 1.0
                active = logits_s.shape[0]
            ce = ce + jnp.mean(_masked_time_mean(ce_s, seq_len_s))
            accuracies[f'step_{step}_accuracy'] = jnp.sum(
                _masked_time_mean(hits, seq_len_s)
                * accuracy_correction) / active
            negatives[f'step_{step}_negatives'] = jnp.mean(
                jnp.sum(jax.lax.stop_gradient(logits_s) > _NEG_INF / 2,
                        axis=1) - 1.0)
        ce = ce / len(self.prediction_steps)

        review = dict(
            losses=dict(ce=ce),
            scalars=dict(
                overall_accuracy=sum(accuracies.values())
                / len(accuracies),
                **accuracies,
                **negatives,
            ),
            images=dict(
                input_features=x[:3],
                target_features=x_targets[:3],
            ),
        )
        return {
            key1: {f'{self.prefix}{key2}': value
                   for key2, value in d.items()}
            for key1, d in review.items()
        }

    def modify_summary(self, summary):
        from padertorch_tpu.contrib.mk.tbx_utils import make_grid
        for key in (f'{self.prefix}input_features',
                    f'{self.prefix}target_features'):
            if key not in summary.get('images', {}):
                continue
            image = np.asarray(summary['images'][key])
            if image.ndim == 3:
                image = image[:, None]
            summary['images'][key] = make_grid(
                image[:, :, ::-1], normalize=True, scale_each=False,
                nrow=1)
        return summary

    def get_posteriors(self, outputs):
        """Mean softmax posterior of the target per step, averaged
        (reference ``contrastive.py:572``)."""
        logits, targets, seq_len_z, *_ = outputs
        posteriors = []
        for step, logits_s in zip(self.prediction_steps, logits):
            t_s = logits_s.shape[2]
            seq_len_s = (None if seq_len_z is None
                         else np.maximum(
                             np.asarray(seq_len_z) - abs(step), 0))
            targets_s = jnp.broadcast_to(
                targets[:, :t_s], (logits_s.shape[0], t_s))
            softmax = jax.nn.softmax(
                jax.lax.stop_gradient(logits_s), axis=1)
            posterior = jnp.take_along_axis(
                softmax, targets_s[:, None, :], axis=1)[:, 0]
            posteriors.append(_masked_time_mean(posterior, seq_len_s))
        posteriors = jnp.stack(posteriors, axis=1)
        posteriors = posteriors * np.sqrt(posteriors.shape[0])
        return jnp.mean(posteriors, axis=1)


class CPCFeatureExtractor(Module):
    """Frozen feature extraction through a trained CPC's frontend +
    encoder (reference ``contrastive.py:591``)."""

    def __init__(self, cpc):
        self.cpc = cpc

    def forward(self, x, seq_len=None):
        if self.cpc.feature_extractor is not None:
            x, seq_len = self.cpc.feature_extractor(x, seq_len=seq_len)
        if x.ndim == 4:
            b, d, f, t = x.shape
            x = x.reshape(b, d * f, t)
        if self.cpc.encoder is None:
            z, seq_len_z = x, seq_len
        else:
            z, seq_len_z = self.cpc.encoder(x, seq_len)
        if z.ndim == 4:
            b, d, f, t = z.shape
            z = z.reshape(b, d * f, t)
        return jax.lax.stop_gradient(z), seq_len_z
