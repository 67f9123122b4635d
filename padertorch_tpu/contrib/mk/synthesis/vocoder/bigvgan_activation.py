"""Anti-aliased snake activation (BigVGAN).

Reference parity:
``contrib/mk/synthesis/vocoder/nvidia_bigvgan/alias_free_activation`` —
there a fused CUDA kernel (upsample -> snake -> downsample) with a torch
fallback.  Here the composition is expressed in jnp: XLA fuses the FIR
resampling convs with the pointwise snake on TPU (our Pallas/XLA
measurements showed compiler fusion at parity for exactly this op mix —
see ``doc/performance.md``).
"""
import math

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from padertorch_tpu.base import Module

__all__ = ['Snake', 'SnakeBeta', 'UpSample1d', 'DownSample1d',
           'Activation1d']


def _kaiser_sinc_filter1d(cutoff, half_width, kernel_size):
    """Kaiser-windowed sinc low-pass (as in the BigVGAN reference)."""
    even = kernel_size % 2 == 0
    half_size = kernel_size // 2
    delta_f = 4 * half_width
    a = 2.285 * (half_size - 1) * math.pi * delta_f + 7.95
    if a > 50.0:
        beta = 0.1102 * (a - 8.7)
    elif a >= 21.0:
        beta = 0.5842 * (a - 21) ** 0.4 + 0.07886 * (a - 21.0)
    else:
        beta = 0.0
    window = np.kaiser(kernel_size, beta)
    if even:
        time = np.arange(-half_size, half_size) + 0.5
    else:
        time = np.arange(kernel_size) - half_size
    if cutoff == 0:
        return np.zeros(kernel_size)
    f = 2 * cutoff * window * np.sinc(2 * cutoff * time)
    return (f / f.sum()).astype('float32')


class Snake(Module):
    """snake(x) = x + sin^2(alpha x) / alpha, learnable per channel."""

    def __init__(self, channels, alpha=1.0, alpha_logscale=False):
        self.alpha_logscale = alpha_logscale
        init = jnp.zeros((channels,)) if alpha_logscale \
            else jnp.ones((channels,)) * alpha
        self.alpha = init

    def forward(self, x):  # (B, C, T)
        alpha = jnp.exp(self.alpha) if self.alpha_logscale else self.alpha
        alpha = alpha[None, :, None]
        return x + jnp.sin(alpha * x) ** 2 / (alpha + 1e-9)


class SnakeBeta(Module):
    """snakebeta(x) = x + sin^2(alpha x) / beta (separate magnitude)."""

    def __init__(self, channels, alpha_logscale=True):
        self.alpha_logscale = alpha_logscale
        init = jnp.zeros((channels,)) if alpha_logscale \
            else jnp.ones((channels,))
        self.alpha = init
        self.beta = init

    def forward(self, x):
        if self.alpha_logscale:
            alpha = jnp.exp(self.alpha)[None, :, None]
            beta = jnp.exp(self.beta)[None, :, None]
        else:
            alpha = self.alpha[None, :, None]
            beta = self.beta[None, :, None]
        return x + jnp.sin(alpha * x) ** 2 / (beta + 1e-9)


class UpSample1d(Module):
    """Sinc-interpolating upsample, matching the reference's phase and
    replicate-padding exactly (``alias_free_activation/torch/
    resample.py``: replicate-pad, ``ratio * conv_transpose1d(stride=
    ratio)``, crop ``pad_left/pad_right``)."""

    def __init__(self, ratio=2, kernel_size=None):
        self.ratio = ratio
        self.kernel_size = kernel_size or int(6 * ratio // 2) * 2
        self.stride = ratio
        self.pad = self.kernel_size // ratio - 1
        self.pad_left = self.pad * self.stride \
            + (self.kernel_size - self.stride) // 2
        self.pad_right = self.pad * self.stride \
            + (self.kernel_size - self.stride + 1) // 2
        filt = _kaiser_sinc_filter1d(
            0.5 / ratio, 0.6 / ratio, self.kernel_size) * ratio
        self.register_buffer('filter', jnp.asarray(filt))

    def forward(self, x):  # (B, C, T) -> (B, C, T*ratio)
        b, c, t = x.shape
        k = self.kernel_size
        x = jnp.pad(x, ((0, 0), (0, 0), (self.pad, self.pad)),
                    mode='edge')
        # conv_transpose1d == fractionally-strided conv with the
        # flipped kernel and full padding (k-1 each side)
        kernel = jnp.flip(self.filter).reshape(1, 1, -1)
        y = lax.conv_general_dilated(
            x.reshape(b * c, 1, -1), kernel,
            window_strides=(1,),
            padding=((k - 1, k - 1),),
            lhs_dilation=(self.ratio,),
            dimension_numbers=('NCH', 'OIH', 'NCH'))
        y = y.reshape(b, c, -1)
        return y[..., self.pad_left:y.shape[-1] - self.pad_right]


class DownSample1d(Module):
    """Anti-aliasing low-pass + decimate, matching the reference's
    replicate padding (``LowPassFilter1d``: pad ``(k//2 - even,
    k//2)``, strided conv)."""

    def __init__(self, ratio=2, kernel_size=None):
        self.ratio = ratio
        self.kernel_size = kernel_size or int(6 * ratio // 2) * 2
        filt = _kaiser_sinc_filter1d(
            0.5 / ratio, 0.6 / ratio, self.kernel_size)
        self.register_buffer('filter', jnp.asarray(filt))
        even = self.kernel_size % 2 == 0
        self.pad_left = self.kernel_size // 2 - int(even)
        self.pad_right = self.kernel_size // 2

    def forward(self, x):  # (B, C, T) -> (B, C, T//ratio)
        b, c, t = x.shape
        x = jnp.pad(
            x, ((0, 0), (0, 0), (self.pad_left, self.pad_right)),
            mode='edge')
        kernel = self.filter.reshape(1, 1, -1)
        y = lax.conv_general_dilated(
            x.reshape(b * c, 1, -1), kernel,
            window_strides=(self.ratio,),
            padding=((0, 0),),
            dimension_numbers=('NCH', 'OIH', 'NCH'))
        return y.reshape(b, c, -1)


class Activation1d(Module):
    """upsample -> activation -> downsample (alias-free nonlinearity).

    >>> from padertorch_tpu import random as ptrandom
    >>> ptrandom.seed(0)
    >>> act = Activation1d(Snake(4))
    >>> import jax.numpy as jnp
    >>> act(jnp.ones((2, 4, 32))).shape
    (2, 4, 32)
    """

    def __init__(self, activation, up_ratio=2, down_ratio=2,
                 up_kernel_size=12, down_kernel_size=12):
        self.up = UpSample1d(up_ratio, up_kernel_size)
        self.activation = activation
        self.down = DownSample1d(down_ratio, down_kernel_size)

    def forward(self, x):
        return self.down(self.activation(self.up(x)))
