"""Conv layers and CNN stacks with padding/length bookkeeping.

Reference parity: ``padertorch/contrib/je/modules/conv.py`` —
``Conv1d/Conv2d(+Transpose)`` with pad-type handling, norm, gated
activations and residual options; ``CNN1d/CNN2d`` stacks that track
sequence lengths through stride/pooling so padded batches stay masked
correctly.
"""
import numpy as np
import jax
import jax.numpy as jnp

from padertorch_tpu.base import Module
from padertorch_tpu import nn
from padertorch_tpu.ops.mappings import ACTIVATION_FN_MAP
from padertorch_tpu.utils.misc import to_list
from padertorch_tpu.modules.normalization import Normalization

__all__ = ['Conv1d', 'Conv2d', 'ConvTranspose1d', 'ConvTranspose2d',
           'CNN1d', 'CNN2d', 'Pool1d', 'Pool2d']


def compute_pad_size(kernel_size, dilation, stride, pad_type):
    if pad_type is None:
        return (0, 0)
    total = dilation * (kernel_size - 1)
    if pad_type == 'both':
        return (total // 2, -(-total // 2))
    if pad_type == 'front':
        return (total, 0)
    if pad_type == 'end':
        return (0, total)
    raise ValueError(f'Unknown pad_type {pad_type!r}')


def compute_conv_out_size(in_size, kernel_size, dilation, stride,
                          pad_type):
    front, end = compute_pad_size(kernel_size, dilation, stride, pad_type)
    return (in_size + front + end - dilation * (kernel_size - 1) - 1) \
        // stride + 1


class _ConvBase(Module):
    n: int = 1
    is_transpose = False

    def __init__(self, in_channels, out_channels, kernel_size, *,
                 dropout=0.0, pad_type='both', dilation=1, stride=1,
                 bias=True, groups=1, norm=None, activation_fn='relu',
                 gated=False, pre_activation=False):
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = to_list(kernel_size, self.n)
        self.dilation = to_list(dilation, self.n)
        self.stride = to_list(stride, self.n)
        self.pad_type = to_list(pad_type, self.n)
        self.dropout = nn.Dropout(dropout) if dropout else None
        self.activation_fn = ACTIVATION_FN_MAP[activation_fn]()
        self.gated = gated
        self.pre_activation = pre_activation
        if norm is None:
            self.norm = None
        elif norm == 'batch':
            fmt = 'bct' if self.n == 1 else 'bcft'
            shape = [None, in_channels if pre_activation else out_channels]
            shape += [None] * self.n
            stats = 'bt' if self.n == 1 else 'bft'
            self.norm = Normalization(
                data_format=fmt, shape=shape, statistics_axis=stats,
                independent_axis='c')
        elif norm == 'sequence':
            fmt = 'bct' if self.n == 1 else 'bcft'
            shape = [None, in_channels if pre_activation else out_channels]
            shape += [None] * self.n
            self.norm = Normalization(
                data_format=fmt, shape=shape, statistics_axis='t',
                independent_axis='c', batch_axis='b', sequence_axis='t')
        elif callable(norm):
            self.norm = norm
        else:
            raise ValueError(f'Unknown norm {norm!r}')
        conv_cls = self._conv_cls()
        out = out_channels * (2 if gated else 1)
        self.conv = conv_cls(
            in_channels, out, kernel_size=kernel_size,
            dilation=dilation, stride=stride, bias=bias, groups=groups)

    def _conv_cls(self):
        if self.is_transpose:
            return nn.ConvTranspose1d if self.n == 1 else nn.ConvTranspose2d
        return nn.Conv1d if self.n == 1 else nn.Conv2d

    def _pad(self, x):
        pads = [
            compute_pad_size(k, d, s, p)
            for k, d, s, p in zip(self.kernel_size, self.dilation,
                                  self.stride, self.pad_type)
        ]
        if any(sum(p) for p in pads):
            pad_width = [(0, 0), (0, 0)] + [tuple(p) for p in pads]
            x = jnp.pad(x, pad_width)
        return x

    def forward(self, x, seq_len=None):
        """x: (B, C, [F,] T); returns (y, out_seq_len)."""
        if self.dropout is not None:
            x = self.dropout(x)
        if self.pre_activation and self.norm is not None:
            x = self.norm(x, sequence_lengths=seq_len) \
                if isinstance(self.norm, Normalization) else self.norm(x)
        if self.pre_activation:
            x = self.activation_fn(x)
        if not self.is_transpose:
            x = self._pad(x)
        y = self.conv(x)
        if self.gated:
            y, gate = jnp.split(y, 2, axis=1)
            y = y * jax.nn.sigmoid(gate)
        out_seq_len = self.get_out_lengths(seq_len)
        if not self.pre_activation:
            if self.norm is not None:
                y = self.norm(y, sequence_lengths=out_seq_len) \
                    if isinstance(self.norm, Normalization) \
                    else self.norm(y)
            y = self.activation_fn(y)
        return y, out_seq_len

    def get_out_lengths(self, seq_len):
        """Sequence lengths after this conv (time = last axis)."""
        if seq_len is None:
            return None
        seq_len = np.asarray(seq_len) if not hasattr(
            seq_len, 'dtype') else seq_len
        k = self.kernel_size[-1]
        d = self.dilation[-1]
        s = self.stride[-1]
        p = self.pad_type[-1]
        if self.is_transpose:
            return seq_len * s + d * (k - 1) + 1 - s
        front, end = compute_pad_size(k, d, s, p)
        return (seq_len + front + end - d * (k - 1) - 1) // s + 1


class Conv1d(_ConvBase):
    n = 1


class Conv2d(_ConvBase):
    n = 2


class ConvTranspose1d(_ConvBase):
    n = 1
    is_transpose = True


class ConvTranspose2d(_ConvBase):
    n = 2
    is_transpose = True


class _Pool(Module):
    n = 1

    def __init__(self, pool_type='max', pool_size=2):
        self.pool_type = pool_type
        self.pool_size = pool_size

    def forward(self, x, seq_len=None):
        if self.pool_size in (1, None):
            return x, seq_len
        k = to_list(self.pool_size, self.n)
        window = (1, 1) + tuple(k)
        strides = window
        if self.pool_type == 'max':
            y = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, window[:x.ndim],
                strides[:x.ndim], 'VALID')
        elif self.pool_type == 'avg':
            y = jax.lax.reduce_window(
                x, 0.0, jax.lax.add, window[:x.ndim], strides[:x.ndim],
                'VALID') / np.prod(k)
        else:
            raise ValueError(self.pool_type)
        if seq_len is not None:
            seq_len = np.asarray(seq_len) // k[-1] if not hasattr(
                seq_len, 'dtype') else seq_len // k[-1]
        return y, seq_len


class Pool1d(_Pool):
    n = 1


class Pool2d(_Pool):
    n = 2


class _CNN(Module):
    """Stack of convs (+ optional pooling), with length bookkeeping.

    Reference parity: ``je/modules/conv.py:954-966``.
    """

    conv_cls = None
    pool_cls = None

    def __init__(self, in_channels, out_channels, kernel_size, *,
                 dropout=0.0, pad_type='both', dilation=1, stride=1,
                 norm=None, activation_fn='relu', gated=False,
                 pool_type='max', pool_size=1, output_activation_fn=None,
                 residual_connections=None):
        out_channels = list(out_channels)
        num_layers = len(out_channels)
        kernel_sizes = to_list(kernel_size, num_layers)
        dilations = to_list(dilation, num_layers)
        strides = to_list(stride, num_layers)
        pool_sizes = to_list(pool_size, num_layers)
        dropouts = to_list(dropout, num_layers)
        norms = to_list(norm, num_layers)
        activations = to_list(activation_fn, num_layers)
        if output_activation_fn is not None:
            activations[-1] = output_activation_fn
        self.residual_connections = to_list(
            residual_connections
            if residual_connections is not None else [None] * num_layers,
            num_layers)
        channels = [in_channels] + out_channels
        self.convs = [
            self.conv_cls(
                channels[i], channels[i + 1], kernel_sizes[i],
                dropout=dropouts[i], pad_type=pad_type,
                dilation=dilations[i], stride=strides[i], norm=norms[i],
                activation_fn=activations[i], gated=gated)
            for i in range(num_layers)
        ]
        self.pools = [
            self.pool_cls(pool_type=pool_type, pool_size=pool_sizes[i])
            for i in range(num_layers)
        ]
        self.out_channels = out_channels[-1]

    def forward(self, x, seq_len=None):
        residuals = {}
        for i, (conv, pool) in enumerate(zip(self.convs, self.pools)):
            dst = self.residual_connections[i]
            if dst is not None:
                residuals.setdefault(int(dst), []).append(x)
            x, seq_len = conv(x, seq_len)
            for res in residuals.pop(i, []):
                if res.shape == x.shape:
                    x = x + res
            x, seq_len = pool(x, seq_len)
        return x, seq_len


class CNN1d(_CNN):
    conv_cls = Conv1d
    pool_cls = Pool1d


class CNN2d(_CNN):
    conv_cls = Conv2d
    pool_cls = Pool2d


def resnet50(in_channels=1, base_planes=64, norm='batch'):
    """ResNet-50-style CNN2d bottleneck stack builder.

    Reference parity: ``contrib/je/modules/conv.py:970`` (there a CNN2d
    factory with ResNet-50 layout).  Returns a CNN2d whose channel plan
    follows (3, 4, 6, 3) bottleneck groups.
    """
    plan = []
    strides = []
    for i, blocks in enumerate((3, 4, 6, 3)):
        planes = base_planes * (2 ** i) * 4
        for j in range(blocks):
            plan.append(planes)
            strides.append(2 if (j == 0 and i > 0) else 1)
    return CNN2d(
        in_channels=in_channels,
        out_channels=plan,
        kernel_size=3,
        stride=strides,
        norm=norm,
        residual_connections=None,
    )
