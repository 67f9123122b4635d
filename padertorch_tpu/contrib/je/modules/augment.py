"""Data augmentation modules (train-time only, jit-safe).

Reference parity: ``padertorch/contrib/je/modules/augment.py`` — the
subset used by the recipes: Scale, Shift, Mixup, Mask (time masking),
AdditiveNoise, GaussianBlur2d, Superpose.  Randomness flows through
``padertorch_tpu.random.key_context`` like dropout.
"""
import numpy as np
import jax
import jax.numpy as jnp

from padertorch_tpu.base import Module
from padertorch_tpu import random as ptrandom

__all__ = [
    'Scale', 'Shift', 'Mixup', 'Mask', 'AdditiveNoise', 'GaussianBlur2d',
    'Superpose', 'TruncatedExponential', 'Uniform', 'LogTruncatedNormal',
    'TimeWarping',
    'gaussian', 'get_gaussian_kernel1d', 'get_gaussian_kernel2d',
]


def gaussian(window_size, sigma):
    """Normalized Gaussian window (reference ``augment.py:403``).

    ``sigma`` may be a scalar or a ``(B,)`` array -> ``(B, window_size)``
    per-example windows (rows sum to 1).

    >>> np.round(np.asarray(gaussian(3, 2.5), dtype='float64'), 4).tolist()
    [0.3243, 0.3513, 0.3243]
    """
    x = jnp.arange(window_size, dtype='float32') - window_size // 2
    sigma = jnp.asarray(sigma, dtype='float32')
    if sigma.ndim > 0:
        sigma = sigma[..., None]
    if window_size % 2 == 0:
        x = x + 0.5
    g = jnp.exp(-x ** 2 / (2 * sigma ** 2))
    return g / jnp.sum(g, axis=-1, keepdims=True)


def get_gaussian_kernel1d(kernel_size, sigma, force_even=False):
    """1-D Gaussian filter coefficients (reference ``augment.py:371``).

    >>> np.round(np.asarray(get_gaussian_kernel1d(5, 1.5), dtype='float64'), 4).tolist()
    [0.1201, 0.2339, 0.2921, 0.2339, 0.1201]
    """
    if (not isinstance(kernel_size, int)
            or (kernel_size % 2 == 0 and not force_even)
            or kernel_size <= 0):
        raise TypeError(
            f'kernel_size must be an odd positive integer. '
            f'Got {kernel_size}')
    return gaussian(kernel_size, sigma)


def get_gaussian_kernel2d(kernel_size, sigma, force_even=False):
    """2-D (separable) Gaussian kernel; with a ``(B,)`` sigma returns
    ``(B, k, k)`` per-example kernels (reference ``augment.py:339``).

    >>> np.round(np.asarray(get_gaussian_kernel2d(3, 1.5), dtype='float64'), 4).tolist()
    [[0.0947, 0.1183, 0.0947], [0.1183, 0.1478, 0.1183], [0.0947, 0.1183, 0.0947]]
    """
    k1 = get_gaussian_kernel1d(kernel_size, sigma, force_even)
    return k1[..., :, None] * k1[..., None, :]


class TimeWarping(Module):
    """Resample the sequence axis by a caller-provided warping function.

    Reference parity: ``je/modules/augment.py:42`` — ``warping_fn(
    seq_len) -> (time_indices (B, T), new_seq_len)``; every tensor is
    linearly interpolated at the (fractional) source indices along the
    sequence axis.  Train-time only; the index plan is computed on the
    host (numpy), the gather runs on device.

    >>> import numpy as np, jax.numpy as jnp
    >>> x = jnp.cumsum(jnp.ones((3, 1, 4, 5)), -1) - 1
    >>> factors = np.array([1, 2, 3])
    >>> warping_fn = lambda seq_len: (
    ...     np.minimum(np.arange(max(seq_len)) / factors[:, None],
    ...                max(seq_len) - 1),
    ...     np.minimum(factors * np.array(seq_len), max(seq_len)))
    >>> warp = TimeWarping(warping_fn=warping_fn)
    >>> y, seq_len = warp(x, seq_len=[3, 4, 5])
    >>> np.asarray(y[1, 0, 0]).round(4).tolist()
    [0.0, 0.5, 1.0, 1.5, 2.0]
    >>> np.asarray(seq_len).astype(int).tolist()
    [3, 5, 5]
    """

    def __init__(self, warping_fn, batch_axis=0, sequence_axis=-1):
        self.warping_fn = warping_fn
        self.batch_axis = batch_axis
        self.sequence_axis = sequence_axis

    def forward(self, *tensors, seq_len):
        if not self.training:
            return (*tensors, seq_len)
        assert seq_len is not None
        time_indices, seq_len = self.warping_fn(seq_len)
        ceil = np.ceil(time_indices).astype(int)
        floor = np.floor(time_indices).astype(int)
        batch_indices = np.arange(len(ceil))[:, None]
        ceil_w = jnp.asarray(1 - ceil + time_indices)
        floor_w = jnp.asarray(
            (1 - time_indices + floor) * (floor != ceil))
        out = []
        for tensor in tensors:
            batch_axis = self.batch_axis % tensor.ndim
            sequence_axis = self.sequence_axis % tensor.ndim
            x = jnp.moveaxis(tensor, (batch_axis, sequence_axis), (0, 1))
            cw = ceil_w.reshape(ceil_w.shape + (1,) * (x.ndim - 2))
            fw = floor_w.reshape(floor_w.shape + (1,) * (x.ndim - 2))
            y = x[batch_indices, ceil] * cw + x[batch_indices, floor] * fw
            out.append(
                jnp.moveaxis(y, (0, 1), (batch_axis, sequence_axis)))
        return (*out, seq_len)


class Uniform:
    """Sampling fn: uniform in [low, high) (paderbox.random_utils parity)."""

    def __init__(self, low=0.0, high=1.0):
        self.low = low
        self.high = high

    def __call__(self, key, shape=()):
        return jax.random.uniform(
            key, shape, minval=self.low, maxval=self.high)


class TruncatedExponential:
    def __init__(self, loc=0.0, scale=1.0, truncation=3.0):
        self.loc = loc
        self.scale = scale
        self.truncation = truncation

    def __call__(self, key, shape=()):
        u = jax.random.uniform(key, shape)
        max_x = (self.truncation - self.loc) / self.scale
        # inverse cdf of truncated exp
        x = -jnp.log(1 - u * (1 - jnp.exp(-max_x)))
        return self.loc + self.scale * x


class LogTruncatedNormal:
    def __init__(self, scale=1.0, truncation=3.0):
        self.scale = scale
        self.truncation = truncation

    def __call__(self, key, shape=()):
        x = jax.random.truncated_normal(
            key, -self.truncation / self.scale,
            self.truncation / self.scale, shape) * self.scale
        return jnp.exp(x)


class Scale(Module):
    """Random per-example scaling. Reference: augment.py:8."""

    def __init__(self, scale_sampling_fn=None):
        self.scale_sampling_fn = scale_sampling_fn or Uniform(0.5, 2.0)

    def forward(self, x, *args):
        if not self.training:
            return x
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        scale = self.scale_sampling_fn(ptrandom.next_key(), shape)
        return x * scale.astype(x.dtype)


class Shift(Module):
    """Random circular time shift along the last axis."""

    def __init__(self, max_shift=100):
        self.max_shift = max_shift

    def forward(self, x):
        if not self.training:
            return x
        shift = jax.random.randint(
            ptrandom.next_key(), (), -self.max_shift, self.max_shift + 1)
        return jnp.roll(x, shift, axis=-1)


class Mixup(Module):
    """Mixup within the batch (reference augment.py, Zhang 2017).

    Returns (mixed_x, mixed_targets) when targets are given.
    """

    def __init__(self, p=1.0, alpha=1.0):
        self.p = p
        self.alpha = alpha

    def forward(self, x, targets=None):
        if not self.training:
            return x if targets is None else (x, targets)
        b = x.shape[0]
        k1, k2, k3 = (ptrandom.next_key(), ptrandom.next_key(),
                      ptrandom.next_key())
        lam = jax.random.beta(k1, self.alpha, self.alpha, (b,))
        lam = jnp.maximum(lam, 1 - lam)  # keep the original dominant
        apply = jax.random.bernoulli(k2, self.p, (b,))
        perm = jax.random.permutation(k3, b)
        lam = jnp.where(apply, lam, 1.0)
        shape = (b,) + (1,) * (x.ndim - 1)
        mixed = lam.reshape(shape) * x \
            + (1 - lam.reshape(shape)) * x[perm]
        if targets is None:
            return mixed
        tshape = (b,) + (1,) * (targets.ndim - 1)
        mixed_t = jnp.maximum(
            targets * lam.reshape(tshape) + 0 * targets,
            targets[perm] * (1 - lam.reshape(tshape)))
        return mixed, mixed_t


class Mask(Module):
    """Random axis masking (SpecAugment building block).

    Reference parity: augment.py Mask.
    """

    def __init__(self, axis, n_masks=1, max_masked_steps=None,
                 max_masked_rate=1.0):
        self.axis = axis
        self.n_masks = n_masks
        self.max_masked_steps = max_masked_steps
        self.max_masked_rate = max_masked_rate

    def forward(self, x, seq_len=None):
        if not self.training:
            return x
        axis = self.axis % x.ndim
        t = x.shape[axis]
        max_width = t if self.max_masked_steps is None \
            else min(self.max_masked_steps, t)
        max_width = int(min(max_width, t * self.max_masked_rate))
        b = x.shape[0]
        for _ in range(self.n_masks):
            k1, k2 = ptrandom.next_key(), ptrandom.next_key()
            width = jax.random.randint(k1, (b,), 0, max_width + 1)
            onset = jax.random.randint(k2, (b,), 0, t)
            idx_shape = [1] * x.ndim
            idx_shape[axis] = t
            idx = jnp.arange(t).reshape(idx_shape)
            bshape = [1] * x.ndim
            bshape[0] = b
            onset = onset.reshape(bshape)
            width = width.reshape(bshape)
            mask = (idx < onset) | (idx >= onset + width)
            x = x * mask.astype(x.dtype)
        return x


class AdditiveNoise(Module):
    """Add white noise with a random per-example scale."""

    def __init__(self, max_scale):
        self.max_scale = max_scale

    def forward(self, x):
        if not self.training:
            return x
        k1, k2 = ptrandom.next_key(), ptrandom.next_key()
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        scale = jax.random.uniform(k1, shape, maxval=self.max_scale)
        return x + scale * jax.random.normal(k2, x.shape, x.dtype)


class GaussianBlur2d(Module):
    """Gaussian blur over the last two axes with a *per-example* sampled
    sigma (reference ``augment.py:258``: ``sigma_sampling_fn(B)`` draws B
    sigmas, each example gets its own kernel via a grouped conv;
    'reflect' boundary handling by default).
    """

    def __init__(self, kernel_size=5, sigma_sampling_fn=None,
                 pad_mode='reflect'):
        assert pad_mode in ('constant', 'reflect', 'replicate',
                            'circular'), pad_mode
        self.kernel_size = kernel_size
        self.sigma_sampling_fn = sigma_sampling_fn or Uniform(0.1, 1.0)
        self.pad_mode = pad_mode

    def forward(self, x):
        if not self.training:
            return x
        assert x.ndim == 4, x.shape
        b, c, h, w = x.shape
        k = self.kernel_size
        sigma = jnp.maximum(
            self.sigma_sampling_fn(ptrandom.next_key(), (b,)), 1e-3)
        kernels = get_gaussian_kernel2d(k, sigma)  # (B, k, k)
        # depthwise conv: every (example, channel) plane gets its
        # example's kernel
        kernel = jnp.repeat(kernels, c, axis=0)[:, None]  # (B*C, 1, k, k)
        mode = {'constant': 'constant', 'reflect': 'reflect',
                'replicate': 'edge', 'circular': 'wrap'}[self.pad_mode]
        lo, hi = (k - 1) // 2, -(-(k - 1) // 2)
        xp = jnp.pad(
            x, ((0, 0), (0, 0), (lo, hi), (lo, hi)), mode=mode)
        xp = xp.reshape(1, b * c, *xp.shape[2:])
        y = jax.lax.conv_general_dilated(
            xp, kernel.astype(x.dtype), (1, 1), padding='VALID',
            dimension_numbers=('NCHW', 'OIHW', 'NCHW'),
            feature_group_count=b * c)
        return y.reshape(b, c, h, w)


class Superpose(Module):
    """Superpose examples within the batch with probability p."""

    def __init__(self, p, scale_fn=None):
        self.p = p
        self.scale_fn = scale_fn

    def forward(self, x, targets=None):
        if not self.training:
            return x if targets is None else (x, targets)
        b = x.shape[0]
        k1, k2 = ptrandom.next_key(), ptrandom.next_key()
        apply = jax.random.bernoulli(k1, self.p, (b,))
        perm = jax.random.permutation(k2, b)
        other = x[perm]
        if self.scale_fn is not None:
            other = self.scale_fn(other)
        shape = (b,) + (1,) * (x.ndim - 1)
        mixed = x + apply.reshape(shape) * other
        if targets is None:
            return mixed
        tshape = (b,) + (1,) * (targets.ndim - 1)
        t2 = jnp.maximum(targets, targets[perm] * apply.reshape(tshape))
        return mixed, t2
