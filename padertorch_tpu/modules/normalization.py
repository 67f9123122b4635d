"""Axis-flexible normalization with sequence-mask-aware statistics.

Reference parity: ``padertorch/modules/normalization.py:8,248`` —
``data_format`` strings ('bcft' etc.), running mean/power buffers with
momentum or cumulative averaging, learnable gamma/beta per independent
axis, freeze/unfreeze, ``inverse``.

TPU design note: the reference hand-derives the batchnorm backward to save
memory (``_Normalize``); under XLA, autodiff + fusion makes that
unnecessary — the normalize expression fuses into a handful of elementwise
kernels, and rematerialization (``jax.checkpoint``) covers the memory
concern where needed.
"""
import numpy as np
import jax
import jax.numpy as jnp

from padertorch_tpu.module import Module
from padertorch_tpu.ops.sequence.mask import compute_mask

__all__ = ['Normalization', 'InputNormalization', 'normalize']


def mask_and_compute_stats(x, sequence_lengths, statistics_axis, batch_axis,
                           sequence_axis):
    """Masked mean/power over ``statistics_axis``; returns
    (masked_x, mask, mean, power, n_values)."""
    mask = compute_mask(x, sequence_lengths, batch_axis, sequence_axis)
    x = x * mask
    n_values = jnp.sum(mask, axis=statistics_axis, keepdims=True)
    n = jnp.maximum(n_values, 1)
    mean = jnp.sum(x, axis=statistics_axis, keepdims=True) / n
    power = jnp.sum(x * x, axis=statistics_axis, keepdims=True) / n
    return x, mask, mean, power, n_values


def normalize(x, gamma, beta, statistics_axis, batch_axis, sequence_axis,
              sequence_lengths, shift, scale, eps):
    """Normalize; returns (y, mean, power, n_values)."""
    x, mask, mean, power, n_values = mask_and_compute_stats(
        x, sequence_lengths, statistics_axis, batch_axis, sequence_axis)
    y = x
    if shift:
        y = y - mean
        var = power - mean * mean
    else:
        var = power
    if scale:
        y = y * jax.lax.rsqrt(jnp.maximum(var, 0) + eps)
    if gamma is not None:
        y = y * gamma
    if beta is not None:
        y = y + beta
    return y * mask, mean, power, n_values


class Normalization(Module):
    """See module docstring; API mirrors the reference.

    >>> import jax.numpy as jnp
    >>> norm = Normalization(data_format='bct', shape=(None, 10, None),
    ...                      statistics_axis='bt', momentum=0.5)
    >>> x, seq_len = 2 * jnp.ones((3, 10, 4)), [1, 2, 3]
    >>> float(norm.running_mean[0, 0, 0]), float(norm.running_power[0, 0, 0])
    (0.0, 1.0)
    >>> y = norm(x, seq_len)
    >>> float(norm.running_mean[0, 0, 0]), float(norm.running_power[0, 0, 0])
    (1.0, 2.5)
    """

    def __init__(
            self,
            data_format='bcft',
            shape=None,
            *,
            statistics_axis='bft',
            independent_axis='c',
            batch_axis='b',
            sequence_axis='t',
            shift=True,
            scale=True,
            eps: float = 1e-5,
            momentum=0.95,
    ):
        self.data_format = data_format.lower()
        self.batch_axis = None if batch_axis is None \
            else self.data_format.index(batch_axis.lower())
        self.sequence_axis = None if sequence_axis is None \
            else self.data_format.index(sequence_axis.lower())
        self.statistics_axis = tuple(
            self.data_format.index(ax.lower()) for ax in statistics_axis)
        self.shift = shift
        self.scale = scale
        self.eps = eps
        self.track_running_stats = (
            batch_axis is not None and batch_axis in statistics_axis)
        if self.track_running_stats:
            reduced_shape = [*shape]
            for ax in self.statistics_axis:
                reduced_shape[ax] = 1
            assert not any(d is None for d in reduced_shape), reduced_shape
            self.register_buffer(
                'num_tracked_values', jnp.zeros(reduced_shape))
            if shift:
                self.register_buffer(
                    'running_mean', jnp.zeros(reduced_shape))
            else:
                self.running_mean = None
            if scale:
                self.register_buffer(
                    'running_power', jnp.ones(reduced_shape))
            else:
                self.running_power = None
        else:
            self.num_tracked_values = None
            self.running_mean = None
            self.running_power = None
        self.momentum = momentum

        if independent_axis is not None:
            reduced_shape = len(self.data_format) * [1]
            for ax in independent_axis:
                ax = self.data_format.index(ax.lower())
                assert shape[ax] is not None, shape
                reduced_shape[ax] = shape[ax]
            self.gamma = jnp.ones(reduced_shape) if scale else None
            self.beta = jnp.zeros(reduced_shape) if self.shift else None
        else:
            self.gamma = None
            self.beta = None

        self.frozen_stats = False

    @property
    def running_var(self):
        # REFERENCE PARITY, quirks included
        # (padertorch/modules/normalization.py:154-162): the Bessel
        # correction multiplies only the power term (not
        # power - mean**2), and eps is added HERE as well as again by
        # the consumers (_running_norm/inverse) — both faithfully
        # reproduce the reference so imported running stats normalize
        # identically.
        n = jnp.clip(self.num_tracked_values, min=2)
        running_var = self.running_power
        if self.shift:
            running_var = n / (n - 1) * running_var \
                - self.running_mean ** 2
        running_var = jnp.maximum(running_var, 0.0)
        return running_var + self.eps

    def reset_running_stats(self):
        if self.track_running_stats:
            self.num_tracked_values = jnp.zeros_like(
                self.num_tracked_values)
            if self.shift:
                self.running_mean = jnp.zeros_like(self.running_mean)
            if self.scale:
                self.running_power = jnp.ones_like(self.running_power)

    def freeze(self, freeze_stats=True):
        """Freeze gamma/beta (via buffer registration) and optionally stats."""
        if self.gamma is not None:
            self.register_buffer('gamma', self.gamma)
        if self.beta is not None:
            self.register_buffer('beta', self.beta)
        self.frozen_stats = freeze_stats

    def unfreeze(self):
        buffers = set(self.__dict__.get('_buffer_names', ()))
        buffers -= {'gamma', 'beta'}
        self.__dict__['_buffer_names'] = frozenset(buffers)
        self.frozen_stats = False

    def forward(self, x, sequence_lengths=None):
        if (self.training and not self.frozen_stats) \
                or not self.track_running_stats:
            y, mean, power, n_values = normalize(
                x, gamma=self.gamma, beta=self.beta,
                statistics_axis=self.statistics_axis,
                batch_axis=self.batch_axis,
                sequence_axis=self.sequence_axis,
                sequence_lengths=sequence_lengths,
                shift=self.shift, scale=self.scale, eps=self.eps,
            )
            if self.track_running_stats:
                self._update_running_stats(mean, power, n_values)
            return y
        return self._running_norm(x, sequence_lengths)

    def _update_running_stats(self, mean, power, n_values):
        n_values = jax.lax.stop_gradient(n_values)
        self.num_tracked_values = self.num_tracked_values + n_values
        if self.momentum is None:
            momentum = 1 - n_values / jax.lax.stop_gradient(
                self.num_tracked_values)
        else:
            momentum = self.momentum
        if self.shift:
            self.running_mean = (
                momentum * self.running_mean
                + (1 - momentum) * jax.lax.stop_gradient(mean))
        if self.scale:
            self.running_power = (
                momentum * self.running_power
                + (1 - momentum) * jax.lax.stop_gradient(power))

    def _running_norm(self, x, sequence_lengths):
        if self.shift:
            x = x - jax.lax.stop_gradient(self.running_mean)
        if self.scale:
            x = x * jax.lax.rsqrt(
                jax.lax.stop_gradient(self.running_var) + self.eps)
        if self.gamma is not None:
            x = x * self.gamma
        if self.beta is not None:
            x = x + self.beta
        return x * compute_mask(
            x, sequence_lengths, self.batch_axis, self.sequence_axis)

    def inverse(self, x, sequence_lengths=None):
        if not self.track_running_stats:
            raise NotImplementedError
        if self.beta is not None:
            x = x - self.beta
        if self.gamma is not None:
            x = x / self.gamma
        if self.scale:
            x = jnp.sqrt(
                jax.lax.stop_gradient(self.running_var) + self.eps) * x
        if self.shift:
            x = x + jax.lax.stop_gradient(self.running_mean)
        return x * compute_mask(
            x, sequence_lengths, self.batch_axis, self.sequence_axis)


class InputNormalization(Normalization):
    """Normalizes with running statistics even in training.

    Reference parity: ``modules/normalization.py:248``.  Not suited for
    hidden layers (gradients do not flow through running statistics).
    """

    def forward(self, x, sequence_lengths=None):
        if self.track_running_stats:
            if self.training and not self.frozen_stats:
                _, _, mean, power, n_values = mask_and_compute_stats(
                    jax.lax.stop_gradient(x), sequence_lengths,
                    self.statistics_axis, self.batch_axis,
                    self.sequence_axis)
                self._update_running_stats(mean, power, n_values)
            return self._running_norm(x, sequence_lengths)
        return super().forward(x, sequence_lengths)
