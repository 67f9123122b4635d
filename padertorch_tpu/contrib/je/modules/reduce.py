"""Sequence reduction/pooling modules.

Reference parity: ``padertorch/contrib/je/modules/reduce.py`` —
Sum/Mean/Max/TakeLast/AutoPool over a masked sequence axis.
"""
import jax
import jax.numpy as jnp

from padertorch_tpu.base import Module
from padertorch_tpu.ops.sequence.mask import compute_mask

__all__ = ['Sum', 'Mean', 'Max', 'TakeLast', 'AutoPool']


class _Reduce(Module):
    def __init__(self, axis=-1):
        self.axis = axis


class Sum(_Reduce):
    def forward(self, x, seq_len=None):
        mask = compute_mask(x, seq_len, 0, self.axis)
        return jnp.sum(x * mask, axis=self.axis)


class Mean(_Reduce):
    def forward(self, x, seq_len=None):
        mask = compute_mask(x, seq_len, 0, self.axis)
        return (jnp.sum(x * mask, axis=self.axis)
                / jnp.maximum(jnp.sum(mask, axis=self.axis), 1))


class Max(_Reduce):
    def forward(self, x, seq_len=None):
        mask = compute_mask(x, seq_len, 0, self.axis)
        neg = jnp.finfo(x.dtype).min
        return jnp.max(jnp.where(mask > 0, x, neg), axis=self.axis)


class TakeLast(_Reduce):
    def forward(self, x, seq_len=None):
        axis = self.axis % x.ndim
        if seq_len is None:
            return jnp.take(x, -1, axis=axis)
        idx = jnp.asarray(seq_len) - 1  # (B,)
        moved = jnp.moveaxis(x, axis, 1)  # (B, T, ...)
        return jnp.take_along_axis(
            moved,
            idx.reshape((-1, 1) + (1,) * (moved.ndim - 2)),
            axis=1,
        )[:, 0]


class AutoPool(_Reduce):
    """Learned softmax pooling (McFee 2018). Reference: reduce.py:93."""

    def __init__(self, n_classes, axis=-1, alpha0=0.0, trainable=True):
        super().__init__(axis)
        self.alpha = jnp.full((n_classes,), float(alpha0))
        if not trainable:
            self.register_buffer('alpha', self.alpha)

    def forward(self, x, seq_len=None):
        """x: (..., n_classes, T) with axis=-1 (default)."""
        axis = self.axis % x.ndim
        mask = compute_mask(x, seq_len, 0, axis)
        alpha = self.alpha.reshape(
            (-1,) + (1,) * (x.ndim - 1 - (x.ndim - 2)))  # broadcast on -2
        logits = x * alpha[..., None] if axis == x.ndim - 1 else x
        neg = jnp.finfo(x.dtype).min
        weights = jax.nn.softmax(
            jnp.where(mask > 0, logits, neg), axis=axis)
        return jnp.sum(x * weights * mask, axis=axis)
