"""Angular-penalty softmax losses (arcface / sphereface / AAM-cosface).

Reference parity:
``padertorch/contrib/tcl/speaker_embeddings/loss.py:5``
(``AngularPenaltySMLoss``) — a final linear layer fused with a
modified cross entropy that penalizes the angle between embedding and
class weight:

- ``arcface``  (ArcFace,    arXiv:1801.07698): cos(θ_y + m), s=64, m=0.5
- ``sphereface`` (SphereFace, arXiv:1704.08063): cos(m·θ_y),  s=64, m=1.35
- ``aam`` (additive-margin / CosFace, arXiv:1801.05599): cos(θ_y) − m,
  s=30, m=0.2

TPU notes: one (B, E) x (E, C) matmul on the MXU; the per-row target
logit is selected with ``take_along_axis`` and the excluded-target
denominator is a masked logsumexp — no python loops over the batch
(the reference builds the exclusion via per-row ``torch.cat``).
"""
import jax
import jax.numpy as jnp

from padertorch_tpu import nn
from padertorch_tpu.base import Module

__all__ = ['AngularPenaltySMLoss']

_DEFAULTS = {
    'arcface': (64.0, 0.5),
    'sphereface': (64.0, 1.35),
    'aam': (30.0, 0.2),
}
# the reference exposes CosFace under its AAM name; accept both
_ALIASES = {'cosface': 'aam'}


class AngularPenaltySMLoss(Module):
    """Angular margin classification loss over speaker embeddings.

    ``forward(embeddings (B, E), labels (B)) -> scalar`` (or per-row
    vector with ``reduce=None``).

    >>> from padertorch_tpu import random as ptrandom
    >>> ptrandom.seed(0)
    >>> import jax.numpy as jnp
    >>> loss = AngularPenaltySMLoss(8, 4, loss_type='aam')
    >>> float(loss(jnp.ones((2, 8)), jnp.asarray([0, 3]))) > 0
    True
    """

    def __init__(self, in_features, out_features, loss_type='aam',
                 eps=1e-7, s=None, m=None, reduce='mean'):
        loss_type = _ALIASES.get(loss_type.lower(), loss_type.lower())
        assert loss_type in _DEFAULTS, loss_type
        s_default, m_default = _DEFAULTS[loss_type]
        self.s = s_default if not s else s
        self.m = m_default if not m else m
        self.loss_type = loss_type
        self.in_features = in_features
        self.out_features = out_features
        self.fc = nn.Linear(in_features, out_features, bias=False)
        self.eps = eps
        self.reduce = reduce

    def forward(self, embeddings, labels):
        if embeddings.ndim == 1:
            embeddings = embeddings[None, :]
        labels = jnp.asarray(labels)
        assert embeddings.shape[0] == labels.shape[0]

        # cosine logits: both embeddings and class weights L2-normalized
        w = self.fc.weight  # (E, C)
        w = w / jnp.maximum(
            jnp.linalg.norm(w, axis=0, keepdims=True), self.eps)
        e = embeddings / jnp.maximum(
            jnp.linalg.norm(embeddings, axis=1, keepdims=True), self.eps)
        logits = e @ w  # (B, C), values in [-1, 1]

        target = jnp.take_along_axis(
            logits, labels[:, None], axis=1)[:, 0]
        clipped = jnp.clip(target, -1.0 + self.eps, 1.0 - self.eps)
        if self.loss_type == 'aam':
            numerator = self.s * (target - self.m)
        elif self.loss_type == 'arcface':
            numerator = self.s * jnp.cos(jnp.arccos(clipped) + self.m)
        else:  # sphereface
            numerator = self.s * jnp.cos(self.m * jnp.arccos(clipped))

        # denominator: exp(numerator) + sum over non-target classes
        onehot = jax.nn.one_hot(labels, self.out_features,
                                dtype=logits.dtype)
        excl = jnp.where(onehot.astype(bool),
                         -jnp.inf, self.s * logits)
        denom = jnp.logaddexp(
            numerator, jax.nn.logsumexp(excl, axis=1))
        loss = numerator - denom
        if self.reduce == 'mean':
            return -jnp.mean(loss)
        return -loss
