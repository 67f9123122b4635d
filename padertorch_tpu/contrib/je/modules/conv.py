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
           'CNN1d', 'CNN2d', 'Pool1d', 'Pool2d', 'Unpool1d', 'Unpool2d',
           'compute_transpose_out_size']


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


def compute_transpose_out_size(in_size, kernel_size, dilation, stride,
                               pad_type):
    """Length after a transpose op (unpool/transpose conv).

    Reference parity: ``je/modules/conv_utils.py:322`` —
    ``_compute_transpose_out_size``: upsample to ``(in-1)*stride + 1``
    plus the kernel extent, minus the padding that the forward op
    would have introduced (end pad reduced by ``stride - 1`` because
    the final window only has to start, not fit, within the signal).
    """
    out = 1 + (np.asarray(in_size) - 1) * stride \
        + dilation * (kernel_size - 1)
    front, end = compute_pad_size(kernel_size, dilation, stride, pad_type)
    end = max(end - stride + 1, 0)
    return out - front - end


def _max_pool_indices_1d(x, k, s):
    """Max pool (B, C, T) returning values + flat argmax time indices.

    XLA-friendly formulation: gather the (W, k) window view with static
    integer index arrays (one strided gather, no dynamic shapes), then
    reduce over the window axis — maps onto vectorized VPU max/argmax
    instead of a serial loop.
    """
    t = x.shape[-1]
    w = (t - k) // s + 1
    starts = np.arange(w) * s
    win_idx = starts[:, None] + np.arange(k)[None, :]     # (W, k)
    windows = x[..., win_idx]                             # (B, C, W, k)
    y = jnp.max(windows, axis=-1)
    offsets = jnp.argmax(windows, axis=-1)                # (B, C, W)
    indices = jnp.asarray(starts)[None, None, :] + offsets
    return y, indices


def _max_pool_indices_2d(x, k, s):
    """Max pool (B, C, F, T) returning values + flat indices into F*T
    (torch ``MaxPool2d(return_indices=True)`` convention)."""
    kf, kt = k
    sf, st = s
    f, t = x.shape[-2:]
    wf = (f - kf) // sf + 1
    wt = (t - kt) // st + 1
    f_idx = np.arange(wf)[:, None] * sf + np.arange(kf)[None, :]
    t_idx = np.arange(wt)[:, None] * st + np.arange(kt)[None, :]
    windows = x[..., f_idx, :][..., t_idx]       # (B, C, Wf, kf, Wt, kt)
    windows = jnp.moveaxis(windows, -3, -2)      # (B, C, Wf, Wt, kf, kt)
    flat = windows.reshape(*windows.shape[:-2], kf * kt)
    y = jnp.max(flat, axis=-1)
    off = jnp.argmax(flat, axis=-1)              # (B, C, Wf, Wt)
    of, ot = off // kt, off % kt
    f_pos = jnp.asarray(f_idx)[None, None, :, None, :]   # broadcast Wf,kf
    t_pos = jnp.asarray(t_idx)[None, None, None, :, :]
    f_abs = jnp.take_along_axis(
        jnp.broadcast_to(f_pos, (*of.shape, kf)), of[..., None], -1
    )[..., 0]
    t_abs = jnp.take_along_axis(
        jnp.broadcast_to(t_pos, (*ot.shape, kt)), ot[..., None], -1
    )[..., 0]
    return y, f_abs * t + t_abs


def _scatter_unpool(values, indices, flat_size):
    """Scatter pooled values back to their argmax positions (inverse of
    max pool). values/indices: (B, C, *W) with flat indices."""
    b, c = values.shape[:2]
    v = values.reshape(b, c, -1)
    i = indices.reshape(b, c, -1)
    out = jnp.zeros((b, c, flat_size), values.dtype)
    bi = jnp.arange(b)[:, None, None]
    ci = jnp.arange(c)[None, :, None]
    return out.at[bi, ci, i].set(v)


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

    def __init__(self, pool_type='max', pool_size=2, pool_stride=None,
                 pad_type=None):
        self.pool_type = pool_type
        self.pool_size = pool_size
        self.pool_stride = pool_size if pool_stride is None \
            else pool_stride
        self.pad_type = pad_type

    def forward(self, x, seq_len=None, return_indices=False):
        if self.pool_type is None or self.pool_size in (1, None):
            return (x, seq_len, None) if return_indices else (x, seq_len)
        k = to_list(self.pool_size, self.n)
        s = to_list(self.pool_stride, self.n)
        pad_types = to_list(self.pad_type, self.n)
        pads = [compute_pad_size(ki, 1, si, pi)
                for ki, si, pi in zip(k, s, pad_types)]
        if any(sum(p) for p in pads):
            fill = -jnp.inf if self.pool_type == 'max' else 0.0
            x = jnp.pad(x, [(0, 0), (0, 0)] + [tuple(p) for p in pads],
                        constant_values=fill)
        indices = None
        if return_indices and self.pool_type == 'max':
            if self.n == 1:
                y, indices = _max_pool_indices_1d(x, k[0], s[0])
            else:
                y, indices = _max_pool_indices_2d(x, k, s)
        else:
            window = (1, 1) + tuple(k)
            strides = (1, 1) + tuple(s)
            if self.pool_type == 'max':
                y = jax.lax.reduce_window(
                    x, -jnp.inf, jax.lax.max, window[:x.ndim],
                    strides[:x.ndim], 'VALID')
            elif self.pool_type == 'avg':
                y = jax.lax.reduce_window(
                    x, 0.0, jax.lax.add, window[:x.ndim],
                    strides[:x.ndim], 'VALID') / np.prod(k)
            else:
                raise ValueError(self.pool_type)
        if seq_len is not None:
            seq_len = np.asarray(seq_len) if not hasattr(
                seq_len, 'dtype') else seq_len
            front, end = pads[-1]
            seq_len = (seq_len + front + end - k[-1]) // s[-1] + 1
            seq_len = jnp.maximum(seq_len, 1) if hasattr(
                seq_len, 'dtype') else np.maximum(seq_len, 1)
        return (y, seq_len, indices) if return_indices else (y, seq_len)


class Pool1d(_Pool):
    n = 1


class Pool2d(_Pool):
    n = 2


class _Unpool(Module):
    """Inverse of max pooling (scatter by indices) or nearest upsample.

    Reference parity: ``je/modules/conv_utils.py:142`` (``Unpool1d``)
    and ``:221`` (``Unpool2d``) — with ``indices`` the pooled values
    are scattered back to their argmax positions and the pool padding
    is trimmed off; without, the input is repeated ``stride`` times
    per axis (nearest-neighbour upsampling). Sequence lengths follow
    ``_compute_transpose_out_size`` (``conv_utils.py:322``).
    """
    n = 1

    def __init__(self, pool_size, stride=None, pad_type=None):
        self.pool_size = pool_size
        self.stride = pool_size if stride is None else stride
        self.pad_type = pad_type

    def forward(self, x, seq_len=None, indices=None):
        k = to_list(self.pool_size, self.n)
        if all(np.asarray(k) < 2):
            return x, seq_len
        s = to_list(self.stride, self.n)
        pad_types = to_list(self.pad_type, self.n)
        if indices is None:
            for axis, si in zip(range(-self.n, 0), s):
                x = jnp.repeat(x, si, axis=axis)
        else:
            full = [
                (n_in - 1) * si + ki
                for n_in, si, ki in zip(x.shape[2:], s, k)
            ]
            y = _scatter_unpool(x, indices, int(np.prod(full)))
            x = y.reshape(*x.shape[:2], *full)
            slices = [slice(None), slice(None)]
            for ki, si, pi in zip(k, s, pad_types):
                front, end = compute_pad_size(ki, 1, si, pi)
                end = max(end - si + 1, 0)
                slices.append(slice(front, x.shape[len(slices)] - end))
            x = x[tuple(slices)]
        if seq_len is not None:
            seq_len = compute_transpose_out_size(
                seq_len, k[-1], 1, s[-1], pad_types[-1])
        return x, seq_len


class Unpool1d(_Unpool):
    n = 1


class Unpool2d(_Unpool):
    n = 2


class _CNN(Module):
    """Stack of convs (+ optional pooling), with length bookkeeping and
    projected residual connections.

    Reference parity: ``je/modules/conv.py:421-743`` — ``residual_
    connections[src]`` names the *destination layer index* whose input
    receives the saved input of layer ``src``; when channels or
    cumulative stride differ, a 1x1 skip conv (with matching stride)
    projects the residual, exactly like the reference's
    ``residual_skip_convs``.
    """

    conv_cls = None
    pool_cls = None

    def __init__(self, in_channels, out_channels, kernel_size, *,
                 dropout=0.0, pad_type='both', dilation=1, stride=1,
                 norm=None, activation_fn='relu', gated=False,
                 pool_type='max', pool_size=1, pool_stride=None,
                 output_activation_fn=None, residual_connections=None,
                 pre_activation=False):
        out_channels = list(out_channels)
        num_layers = len(out_channels)
        kernel_sizes = to_list(kernel_size, num_layers)
        dilations = to_list(dilation, num_layers)
        strides = to_list(stride, num_layers)
        pool_sizes = to_list(pool_size, num_layers)
        pool_strides = to_list(
            pool_size if pool_stride is None else pool_stride,
            num_layers)
        pool_types = to_list(pool_type, num_layers)
        dropouts = to_list(dropout, num_layers)
        norms = to_list(norm, num_layers)
        activations = to_list(activation_fn, num_layers)
        if output_activation_fn is not None:
            activations[-1] = output_activation_fn
        # normalize to list-of-lists of destination indices
        rc = to_list(
            residual_connections
            if residual_connections is not None else [None] * num_layers,
            num_layers)
        self.residual_connections = [
            [] if dst is None else [int(d) for d in to_list(dst)]
            for dst in rc
        ]
        channels = [in_channels] + out_channels
        self.convs = [
            self.conv_cls(
                channels[i], channels[i + 1], kernel_sizes[i],
                dropout=dropouts[i], pad_type=pad_type,
                dilation=dilations[i], stride=strides[i], norm=norms[i],
                activation_fn=activations[i], gated=gated,
                pre_activation=pre_activation)
            for i in range(num_layers)
        ]
        self.pools = [
            self.pool_cls(pool_type=pool_types[i],
                          pool_size=pool_sizes[i],
                          pool_stride=pool_strides[i])
            for i in range(num_layers)
        ]
        # skip projections where channels or cumulative stride mismatch
        self.kernel_sizes = kernel_sizes
        self.dilations = dilations
        self.strides = strides
        self.pool_sizes = pool_sizes
        self.pool_strides = pool_strides
        self.num_layers = num_layers
        skip_convs = {}
        for src, dsts in enumerate(self.residual_connections):
            for dst in dsts:
                assert src < dst <= num_layers, (src, dst)
                # per-axis cumulative stride (strides may be tuples,
                # e.g. (2, 1) for freq-only downsampling)
                cum = np.ones(self.n, dtype=int)
                for j in range(src, dst):
                    cum = cum * np.asarray(to_list(strides[j], self.n))
                    cum = cum * np.asarray(
                        to_list(pool_strides[j], self.n))
                if channels[src] != channels[dst] or (cum != 1).any():
                    stride = (int(cum[0]) if self.n == 1
                              else tuple(int(c) for c in cum))
                    skip_convs[f'{src}->{dst}'] = self.conv_cls(
                        channels[src], channels[dst], 1,
                        stride=stride, activation_fn='identity')
        self.residual_skip_convs = skip_convs
        self.out_channels = out_channels[-1]

    def forward(self, x, seq_len=None):
        saved = {}
        for i, (conv, pool) in enumerate(zip(self.convs, self.pools)):
            for src, res in saved.pop(i, []):
                key = f'{src}->{i}'
                if key in self.residual_skip_convs:
                    res, _ = self.residual_skip_convs[key](res)
                if res.shape == x.shape:
                    x = x + res
            for dst in self.residual_connections[i]:
                saved.setdefault(dst, []).append((i, x))
            x, seq_len = conv(x, seq_len)
            x, seq_len = pool(x, seq_len)
        # destinations == num_layers attach to the output
        for src, res in saved.pop(self.num_layers, []):
            key = f'{src}->{self.num_layers}'
            if key in self.residual_skip_convs:
                res, _ = self.residual_skip_convs[key](res)
            if res.shape == x.shape:
                x = x + res
        return x, seq_len

    def get_receptive_field(self):
        """Receptive field (reference je/modules/conv.py:944)."""
        is_2d = self.n == 2
        receptive_field = np.ones(1 + is_2d, dtype=int)
        for i in reversed(range(self.num_layers)):
            receptive_field *= np.array(
                to_list(self.pool_strides[i], self.n))
            receptive_field += (
                np.array(to_list(self.pool_sizes[i], self.n))
                - np.array(to_list(self.pool_strides[i], self.n)))
            receptive_field *= np.array(to_list(self.strides[i], self.n))
            receptive_field += (
                1 + (np.array(to_list(self.kernel_sizes[i], self.n)) - 1)
                * np.array(to_list(self.dilations[i], self.n))
                - np.array(to_list(self.strides[i], self.n)))
        return receptive_field


class CNN1d(_CNN):
    n = 1
    conv_cls = Conv1d
    pool_cls = Pool1d


class CNN2d(_CNN):
    n = 2
    conv_cls = Conv2d
    pool_cls = Pool2d


def resnet50(in_channels, out_channels, out_pool_size=1,
             activation_fn='relu', pre_activation=False, norm='batch'):
    """ResNet-50 as a CNN2d plan — faithful port of the reference
    builder (``contrib/je/modules/conv.py:970``): 7x7/2 stem with 3x3/2
    max pool, (3, 4, 6, 3) bottleneck groups with 1x1-3x3-1x1 convs and
    projected residual connections, global avg pool, 1x1 classifier.
    """
    out_channels = ([64] + 3 * 3 * [64] + 4 * 3 * [128]
                    + 6 * 3 * [256] + 3 * 3 * [512] + [out_channels])
    assert len(out_channels) == 50
    for i in range(3, 50, 3):
        out_channels[i] *= 4
    kernel_size = [7] + 49 * [1]
    for i in range(2, 50, 3):
        kernel_size[i] *= 3
    stride = ([2] + 3 * 3 * [1] + [2] + (4 * 3 - 1) * [1]
              + [2] + (6 * 3 - 1) * [1] + [2] + 3 * 3 * [1])
    pool_size = [3] + 47 * [1] + [out_pool_size] + [1]
    pool_stride = [2] + 47 * [1] + [out_pool_size] + [1]
    pool_type = ['max'] + 47 * [None] + ['avg'] + [None]
    residual_connections = 50 * [None]
    for i in range(1, 48, 3):
        residual_connections[i] = i + 3
    return CNN2d(
        in_channels=in_channels,
        out_channels=out_channels,
        kernel_size=kernel_size,
        stride=stride,
        pool_size=pool_size,
        pool_stride=pool_stride,
        pool_type=pool_type,
        residual_connections=residual_connections,
        activation_fn=activation_fn,
        pre_activation=pre_activation,
        norm=norm,
    )
