"""Conv-TasNet temporal convolutional network (TCN).

Reference parity: ``padertorch/modules/convnet.py`` (dilated depthwise 1-D
conv blocks with residual connections, gLN/cLN norms, PReLU).  TasNet:
https://arxiv.org/abs/1809.07454.

All convs are ``lax.conv_general_dilated`` (depthwise via
``feature_group_count``), which XLA tiles directly onto the MXU; the norm
and activation fuse into the conv epilogue.
"""
import jax
import jax.numpy as jnp

from padertorch_tpu.module import Module
from padertorch_tpu import nn
from padertorch_tpu.ops.mappings import ACTIVATION_FN_MAP
from padertorch_tpu.utils.misc import to_list

__all__ = ['ConvNet', 'GlobalLayerNorm', 'ChannelwiseLayerNorm',
           'build_norm', 'Conv1d']


class GlobalLayerNorm(Module):
    """gLN: normalize over (C, T) per sample; per-channel affine."""

    def __init__(self, num_channels, eps=1e-8):
        self.eps = eps
        self.gamma = jnp.ones((1, num_channels, 1))
        self.beta = jnp.zeros((1, num_channels, 1))

    def forward(self, x):  # (B, C, T)
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        return self.gamma * (x - mean) * jax.lax.rsqrt(var + self.eps) \
            + self.beta


class ChannelwiseLayerNorm(Module):
    """cLN: normalize over C per (sample, frame); per-channel affine."""

    def __init__(self, num_channels, eps=1e-8):
        self.eps = eps
        self.gamma = jnp.ones((1, num_channels, 1))
        self.beta = jnp.zeros((1, num_channels, 1))

    def forward(self, x):  # (B, C, T)
        mean = jnp.mean(x, axis=1, keepdims=True)
        var = jnp.var(x, axis=1, keepdims=True)
        return self.gamma * (x - mean) * jax.lax.rsqrt(var + self.eps) \
            + self.beta


def build_norm(norm, num_channels):
    """'gLN' | 'cLN' | None -> norm module (reference: jensheit/norm.py)."""
    if norm is None:
        return None
    if norm == 'gLN':
        return GlobalLayerNorm(num_channels)
    if norm == 'cLN':
        return ChannelwiseLayerNorm(num_channels)
    raise ValueError(f'Unknown norm: {norm!r}')


def compute_pad_size(kernel_size, dilation, stride, pad_type):
    """Front/end padding sizes (reference: contrib/je/modules/conv.py)."""
    if pad_type is None:
        return 0, 0
    total = dilation * (kernel_size - 1)
    if pad_type == 'both':
        return total // 2, -(-total // 2)
    if pad_type == 'front':
        return total, 0
    if pad_type == 'end':
        return 0, total
    raise ValueError(f'Unknown pad_type: {pad_type!r}')


class Conv1d(Module):
    """Conv1d with dropout/norm/pad/activation (reference convnet.py:17)."""

    def __init__(self, in_channels, out_channels, kernel_size, dropout=0.0,
                 pad_type='both', groups=1, dilation=1, stride=1, bias=True,
                 norm=None, activation_fn='relu'):
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.dropout = nn.Dropout(dropout) if dropout else None
        self.pad_type = pad_type
        self.kernel_size = kernel_size
        self.dilation = dilation
        self.stride = stride
        self.activation_fn = ACTIVATION_FN_MAP[activation_fn]()
        if norm is not None:
            assert callable(norm), norm
        self.norm = norm
        self.conv = nn.Conv1d(
            in_channels, out_channels, kernel_size=kernel_size,
            dilation=dilation, stride=stride, bias=bias, groups=groups)

    def forward(self, x):  # (B, C, T)
        if self.dropout is not None:
            x = self.dropout(x)
        if self.norm is not None:
            x = self.norm(x)
        front, end = compute_pad_size(
            self.kernel_size, self.dilation, self.stride, self.pad_type)
        if front or end:
            x = jnp.pad(x, ((0, 0), (0, 0), (front, end)))
        return self.activation_fn(self.conv(x))


class _Conv1DBlock(Module):
    """TCN block with a residual connection (reference convnet.py:114).

    ACTUAL op order (matching the reference's Conv1d wrapper, which
    applies its norm BEFORE its conv — reference convnet.py:82-85):
    Norm(in) - Conv1D - PReLU - depthwise Conv1D - PReLU - Norm -
    Conv1D.  The reference's own docstring describes the canonical
    Conv-TasNet order (Conv-PReLU-Norm-...), but its implementation —
    and therefore this parity reimplementation, so imported reference
    weights compute identically — norms first.  Likewise ``forward``
    drops ``sequence_lengths`` before gLN, exactly as the reference's
    ``ConvNet.forward`` does (reference convnet.py:225-241): global
    statistics include padding, a reference quirk kept for parity."""

    def __init__(self, in_channels=256, hidden_channels=512, kernel_size=3,
                 dilation=1, norm='cLN'):
        self.input_conv = Conv1d(
            in_channels, hidden_channels, 1, pad_type=None,
            norm=build_norm(norm, in_channels), activation_fn='prelu')
        self.conv = Conv1d(
            hidden_channels, hidden_channels, kernel_size,
            groups=hidden_channels, activation_fn='prelu',
            pad_type='both', dilation=dilation)
        self.output_conv = Conv1d(
            hidden_channels, in_channels, 1,
            norm=build_norm(norm, hidden_channels),
            activation_fn='identity')

    def forward(self, x):
        y = self.input_conv(x)
        y = self.conv(y)
        y = self.output_conv(y)
        return x + y


class ConvNet(Module):
    """TasNet convolutional separator (reference convnet.py:164).

    >>> from padertorch_tpu import random as ptrandom
    >>> ptrandom.seed(0)
    >>> module = ConvNet(input_size=64, num_blocks=2, num_repeats=2,
    ...                  hidden_channels=32)
    >>> import jax.numpy as jnp
    >>> module(jnp.ones((4, 23, 64)), None).shape
    (4, 23, 64)
    """

    def __init__(self, input_size=256, num_blocks=8, num_repeats=4,
                 hidden_channels=512, kernel_size=3, norm='gLN'):
        self.input_size = input_size
        self.hidden_size = input_size
        self.conv_blocks = nn.Sequential(*[
            nn.Sequential(*[
                _Conv1DBlock(
                    in_channels=input_size,
                    hidden_channels=hidden_channels,
                    kernel_size=kernel_size,
                    norm=norm,
                    dilation=2 ** b,
                )
                for b in range(num_blocks)
            ])
            for _ in range(num_repeats)
        ])

    def forward(self, sequence, sequence_lengths=None):
        """(B, L, N) -> (B, L, N)."""
        del sequence_lengths
        x = jnp.swapaxes(sequence, 1, 2)  # b l n -> b n l
        y = self.conv_blocks(x)
        return jnp.swapaxes(y, 1, 2)
