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
           'CNN1d', 'CNN2d', 'CNNTranspose1d', 'CNNTranspose2d',
           'Pool1d', 'Pool2d', 'Unpool1d', 'Unpool2d', 'Pad', 'Trim',
           'compute_transpose_out_size', 'compute_conv_output_shape',
           'compute_conv_output_sequence_lengths', 'to_pair',
           'map_activation_fn']

_PAD_MODE_MAP = {  # torch F.pad mode -> jnp.pad mode
    'constant': 'constant',
    'replicate': 'edge',
    'reflect': 'reflect',
    'circular': 'wrap',
}


class Pad(Module):
    """Pad the last (two) axes by ``size`` at front/end/both
    (reference ``je/modules/conv_utils.py:11``; 'both' with an odd size
    pads the end one more than the front).

    >>> Pad(side='both')(jnp.ones((1, 1, 4)), 3).shape
    (1, 1, 7)
    """

    def __init__(self, side='both', mode='constant'):
        self.side = side
        self.mode = mode

    def forward(self, x, size):
        assert x.ndim in (3, 4), x.shape
        n = x.ndim - 2
        sides = to_list(self.side, n)
        sizes = to_list(size, n)
        if not any(np.asarray(sizes)):
            return x
        pad = [(0, 0), (0, 0)]
        for side, sz in zip(sides, sizes):
            if side is None or sz < 1:
                assert sz == 0, sizes
                pad.append((0, 0))
            elif side == 'front':
                pad.append((sz, 0))
            elif side == 'both':
                pad.append((sz // 2, -(-sz // 2)))
            elif side == 'end':
                pad.append((0, sz))
            else:
                raise ValueError(f'pad side {side} unknown')
        return jnp.pad(x, pad, mode=_PAD_MODE_MAP[self.mode])


class Trim(Module):
    """Counterpart to :class:`Pad`: remove ``size`` values from the last
    (two) axes (reference ``je/modules/conv_utils.py:57``; 'both' with an
    odd size trims the end one more than the front).

    >>> Trim(side='front')(jnp.ones((1, 1, 7)), 3).shape
    (1, 1, 4)
    """

    def __init__(self, side='both'):
        self.side = side

    def forward(self, x, size):
        assert x.ndim in (3, 4), x.shape
        n = x.ndim - 2
        sides = to_list(self.side, n)
        sizes = to_list(size, n)
        slc = [slice(None)] * x.ndim
        for i, (side, sz) in enumerate(zip(sides, sizes)):
            axis = 2 + i
            if side is None or sz < 1:
                assert sz == 0, sizes
            elif side == 'front':
                slc[axis] = slice(sz, x.shape[axis])
            elif side == 'both':
                slc[axis] = slice(sz // 2, -(-(-sz // 2)) or None)
            elif side == 'end':
                slc[axis] = slice(0, -sz)
            else:
                raise ValueError(f'trim side {side} unknown')
        return x[tuple(slc)]


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


def to_pair(x):
    """Broadcast a scalar to a 2-tuple (reference
    ``je/modules/conv_utils.py:257``)."""
    return tuple(to_list(x, 2))


def map_activation_fn(activation_fn):
    """String/None/callable -> activation callable (reference
    ``conv_utils.py:290``)."""
    if activation_fn in ('linear', None):
        activation_fn = 'identity'
    if isinstance(activation_fn, str):
        return ACTIVATION_FN_MAP[activation_fn]()
    if not callable(activation_fn):
        raise ValueError(
            f'Type {type(activation_fn)} not supported for activation_fn')
    return activation_fn


def compute_conv_output_shape(input_shape, out_channels, kernel_size,
                              dilation, stride, pad_type,
                              transpose=False):
    """(B, C, *spatial) shape after a (transpose) conv (reference
    ``conv_utils.py:330``); per-axis parameters broadcast."""
    input_shape = np.asarray(input_shape)
    n_spatial = len(input_shape) - 2
    output_shape = np.zeros_like(input_shape)
    output_shape[0] = input_shape[0]
    output_shape[1] = out_channels
    kernel_size = to_list(kernel_size, n_spatial)
    dilation = to_list(dilation, n_spatial)
    stride = to_list(stride, n_spatial)
    pad_type = to_list(pad_type, n_spatial)
    fn = compute_transpose_out_size if transpose else compute_conv_out_size
    for d in range(n_spatial):
        output_shape[2 + d] = fn(
            input_shape[2 + d], kernel_size[d], dilation[d], stride[d],
            pad_type[d])
    assert np.all(output_shape > 0), output_shape
    return output_shape.astype(np.int64)


def compute_conv_output_sequence_lengths(input_sequence_lengths,
                                         kernel_size, dilation, pad_type,
                                         stride, transpose=False):
    """Valid-length bookkeeping through a (transpose) conv's LAST
    (time) axis (reference ``conv_utils.py:354``; note the reference's
    argument order — ``pad_type`` before ``stride``)."""
    kernel_size = to_list(kernel_size)
    dilation = to_list(dilation)
    stride = to_list(stride)
    pad_type = to_list(pad_type)
    fn = compute_transpose_out_size if transpose else compute_conv_out_size
    seq_len_out = fn(
        np.asarray(input_sequence_lengths), kernel_size[-1],
        dilation[-1], stride[-1], pad_type[-1])
    assert np.all(seq_len_out > 0), seq_len_out
    return np.asarray(seq_len_out).astype(np.int64)


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
        if self.is_transpose:
            # adjoint of padding is cropping: trim the pad the mirrored
            # forward conv would have added (end reduced by stride - 1,
            # matching compute_transpose_out_size)
            slices = [slice(None), slice(None)]
            crop = False
            for axis, (k, d, s, p) in enumerate(zip(
                    self.kernel_size, self.dilation, self.stride,
                    self.pad_type)):
                front, end = compute_pad_size(k, d, s, p)
                end = max(end - s + 1, 0)
                crop = crop or front or end
                slices.append(slice(front, y.shape[2 + axis] - end))
            if crop:
                y = y[tuple(slices)]
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
        front, end = compute_pad_size(k, d, s, p)
        if self.is_transpose:
            return (seq_len - 1) * s + d * (k - 1) + 1 \
                - front - max(end - s + 1, 0)
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
                 pre_activation=False, return_pool_indices=False):
        self.return_pool_indices = return_pool_indices
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
        pool_indices = []
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
            if self.return_pool_indices:
                x, seq_len, idx = pool(x, seq_len, return_indices=True)
                pool_indices.append(idx)
            else:
                x, seq_len = pool(x, seq_len)
        # destinations == num_layers attach to the output
        for src, res in saved.pop(self.num_layers, []):
            key = f'{src}->{self.num_layers}'
            if key in self.residual_skip_convs:
                res, _ = self.residual_skip_convs[key](res)
            if res.shape == x.shape:
                x = x + res
        if self.return_pool_indices:
            return x, seq_len, pool_indices
        return x, seq_len

    def get_shapes(self, in_shape):
        """Per-layer full output shapes ``[in_shape, out_0, ...]``
        (reference ``je/modules/conv.py`` ``CNN.get_shapes``).

        >>> cnn = CNN2d(in_channels=1, out_channels=[4, 8],
        ...             kernel_size=3, pool_size=2)
        >>> cnn.get_shapes((2, 1, 16, 100))
        [(2, 1, 16, 100), (2, 4, 8, 50), (2, 8, 4, 25)]
        """
        shapes = [tuple(in_shape)]
        cur = np.asarray(in_shape[2:])
        batch = in_shape[0]
        for conv, pool in zip(self.convs, self.pools):
            cur = np.asarray([
                compute_conv_out_size(int(c), k, d, s, p)
                for c, k, d, s, p in zip(
                    cur, conv.kernel_size, conv.dilation, conv.stride,
                    conv.pad_type)
            ])
            if pool.pool_type is not None and \
                    pool.pool_size not in (1, None):
                pk = to_list(pool.pool_size, self.n)
                ps = to_list(pool.pool_stride, self.n)
                pp = to_list(pool.pad_type, self.n)
                out = []
                for c, ki, si, pi in zip(cur, pk, ps, pp):
                    f, e = compute_pad_size(ki, 1, si, pi)
                    out.append((int(c) + f + e - ki) // si + 1)
                cur = np.asarray(out)
            out_channels = conv.out_channels
            shapes.append(
                (batch, out_channels) + tuple(int(c) for c in cur))
        return shapes

    def get_seq_lens(self, in_lengths):
        """Per-layer sequence lengths ``[in_lengths, out_0, ...]``
        (reference ``CNN.get_seq_lens``; time = last axis)."""
        seq = np.asarray(in_lengths)
        lens = [seq]
        for conv, pool in zip(self.convs, self.pools):
            seq = conv.get_out_lengths(seq)
            if pool.pool_type is not None and \
                    pool.pool_size not in (1, None):
                k = to_list(pool.pool_size, self.n)[-1]
                s = to_list(pool.pool_stride, self.n)[-1]
                p = to_list(pool.pad_type, self.n)[-1]
                f, e = compute_pad_size(k, 1, s, p)
                seq = np.maximum((seq + f + e - k) // s + 1, 1)
            lens.append(seq)
        return lens

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


def _mirror_stack_config(config, transpose_cls, transpose_config=None):
    """Mirror a CNN stack config into its transposed counterpart.

    Reference parity: ``je/modules/conv.py:794`` (``get_transpose_config``)
    — reverse the per-layer lists, swap in/out channels, and mirror
    residual connections (``src -> dst`` becomes
    ``num_layers - dst -> num_layers - src``).
    """
    if transpose_config is None:
        transpose_config = {}
    transpose_config['factory'] = transpose_cls
    out_channels = list(config['out_channels'])
    channels = [config['in_channels']] + out_channels
    num_layers = len(out_channels)
    transpose_config['in_channels'] = channels[-1]
    transpose_config['out_channels'] = channels[:-1][::-1]
    rc = config.get('residual_connections')
    if rc is not None:
        mirrored = {}
        for src, dsts in enumerate(to_list(rc, num_layers)):
            for dst in to_list(dsts):
                if dst is not None:
                    mirrored.setdefault(num_layers - dst, []).append(
                        num_layers - src)
        transpose_config['residual_connections'] = [
            (sorted(mirrored[i]) if len(mirrored[i]) > 1
             else mirrored[i][0]) if i in mirrored else None
            for i in range(num_layers)
        ]
    for kw in ('kernel_size', 'pad_type', 'dilation', 'stride',
               'pool_type', 'pool_size', 'pool_stride', 'norm'):
        if kw in config:
            transpose_config[kw] = (
                config[kw][::-1] if isinstance(config[kw], list)
                else config[kw])
    for kw in ('activation_fn', 'pre_activation', 'dropout', 'gated'):
        if kw in config:
            transpose_config[kw] = config[kw]
    return transpose_config


class _CNNTranspose(Module):
    """Mirror stack of ``_CNN``: per layer *unpool then transpose conv*.

    Reference parity: ``je/modules/conv.py:643-791`` transpose branch —
    pool indices arrive in the forward CNN's layer order and are
    consumed reversed (ref ``:684``); ``target_shape`` triggers
    per-layer end-trimming of the transpose conv's surplus samples
    (ref ``:771-783``); residual connections follow the same
    input-of-src to input-of-dst contract as ``_CNN``, with saved
    signals nearest-upsampled across intermediate strides and
    projected by 1x1 convs when channels differ.
    """

    conv_cls = None        # transpose conv layer class
    plain_conv_cls = None  # 1x1 residual projections
    unpool_cls = None

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
            pool_size if pool_stride is None else pool_stride, num_layers)
        self.pool_types = to_list(pool_type, num_layers)  # config mirror
        dropouts = to_list(dropout, num_layers)
        norms = to_list(norm, num_layers)
        activations = to_list(activation_fn, num_layers)
        if output_activation_fn is not None:
            activations[-1] = output_activation_fn
        self.pad_types = to_list(pad_type, num_layers)
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
                dropout=dropouts[i], pad_type=self.pad_types[i],
                dilation=dilations[i], stride=strides[i], norm=norms[i],
                activation_fn=activations[i], gated=gated,
                pre_activation=pre_activation)
            for i in range(num_layers)
        ]
        self.unpools = [
            self.unpool_cls(pool_size=pool_sizes[i],
                            stride=pool_strides[i])
            for i in range(num_layers)
        ]
        self.kernel_sizes = kernel_sizes
        self.dilations = dilations
        self.strides = strides
        self.pool_sizes = pool_sizes
        self.pool_strides = pool_strides
        self.num_layers = num_layers
        self.in_channels = in_channels
        self.out_channels = out_channels[-1]
        self._channels = channels
        skip_convs = {}
        for src, dsts in enumerate(self.residual_connections):
            for dst in dsts:
                assert src < dst <= num_layers, (src, dst)
                if channels[src] != channels[dst]:
                    skip_convs[f'{src}->{dst}'] = self.plain_conv_cls(
                        channels[src], channels[dst], 1,
                        activation_fn='identity')
        self.residual_skip_convs = skip_convs

    def _upsample_factor(self, src, dst):
        """Per-axis cumulative nearest-upsample factor src -> dst."""
        cum = np.ones(self.n, dtype=int)
        for j in range(src, dst):
            cum = cum * np.asarray(to_list(self.strides[j], self.n))
            cum = cum * np.asarray(to_list(self.pool_strides[j], self.n))
        return cum

    def _attach_residuals(self, x, saved, layer):
        for src, res in saved.pop(layer, []):
            cum = self._upsample_factor(src, layer)
            for axis, factor in zip(range(-self.n, 0), cum):
                if factor > 1:
                    res = jnp.repeat(res, int(factor), axis=axis)
            key = f'{src}->{layer}'
            if key in self.residual_skip_convs:
                res, _ = self.residual_skip_convs[key](res)
            # transpose convs emit kernel-extent surplus; trim to match
            if all(r >= s for r, s in zip(res.shape, x.shape)):
                res = res[tuple(slice(0, s) for s in x.shape)]
            if res.shape == x.shape:
                x = x + res
        return x

    def forward(self, x, seq_len=None, target_shape=None,
                target_sequence_lengths=None, pool_indices=None):
        """x: (B, C, [F,] T).

        ``pool_indices``: the mirrored forward CNN's per-layer max-pool
        indices (its own layer order — reversed here, ref ``:684``).
        ``target_shape``: desired full output shape; each layer's
        surplus is end-trimmed to the backward-computed shape plan.
        """
        out_shapes = None
        if target_shape is not None:
            out_shapes = self.get_shapes(target_shape=target_shape)[1:]
        indices = (list(pool_indices)[::-1] if pool_indices is not None
                   else [None] * self.num_layers)
        saved = {}
        for i, (unpool, conv) in enumerate(zip(self.unpools, self.convs)):
            if any(np.asarray(to_list(self.pool_sizes[i], self.n)) > 1):
                x, seq_len = unpool(x, seq_len, indices=indices[i])
            x = self._attach_residuals(x, saved, i)
            for dst in self.residual_connections[i]:
                saved.setdefault(dst, []).append((i, x))
            x, seq_len = conv(x, seq_len)
            if out_shapes is not None:
                surplus = np.asarray(x.shape[2:]) - np.asarray(
                    out_shapes[i][2:])
                assert (surplus >= 0).all(), (
                    x.shape, out_shapes[i],
                    'target larger than produced output — use padding')
                if (surplus > 0).any():
                    x = x[(slice(None), slice(None)) + tuple(
                        slice(0, int(s)) for s in out_shapes[i][2:])]
                if seq_len is not None:
                    t = out_shapes[i][-1]
                    seq_len = (jnp.minimum(seq_len, t)
                               if hasattr(seq_len, 'dtype')
                               else np.minimum(seq_len, t))
        x = self._attach_residuals(x, saved, self.num_layers)
        if target_sequence_lengths is not None:
            seq_len = target_sequence_lengths
        return x, seq_len

    def get_shapes(self, input_shape=None, target_shape=None):
        """Per-layer full output shapes.

        With ``target_shape`` the plan is computed *backwards* (ref
        ``:885``): inverting a transpose conv is the forward conv size
        formula; inverting an unpool is the forward pool size formula.
        Returns ``[input_shape, out_0, ..., out_{L-1}]`` with
        ``out_{L-1} == target_shape``.
        """
        assert (input_shape is None) ^ (target_shape is None)
        if target_shape is not None:
            shapes = [tuple(target_shape)]
            cur = np.asarray(target_shape[2:])
            batch = target_shape[0]
            for i in reversed(range(self.num_layers)):
                k = np.asarray(to_list(self.kernel_sizes[i], self.n))
                d = np.asarray(to_list(self.dilations[i], self.n))
                s = np.asarray(to_list(self.strides[i], self.n))
                front, endc = self._crop(i)
                # invert transpose conv (pad-crop included); ceil-div:
                # the smallest input whose output covers cur
                cur = -(-(cur + front + endc - d * (k - 1) - 1) // s) + 1
                pk = np.asarray(to_list(self.pool_sizes[i], self.n))
                ps = np.asarray(to_list(self.pool_strides[i], self.n))
                up = pk > 1
                cur = np.where(up, -(-(cur - pk) // ps) + 1, cur)
                shapes.append(
                    (batch, self._channels[i]) + tuple(int(c) for c in cur))
            return shapes[::-1]
        shapes = [tuple(input_shape)]
        cur = np.asarray(input_shape[2:])
        batch = input_shape[0]
        for i in range(self.num_layers):
            pk = np.asarray(to_list(self.pool_sizes[i], self.n))
            ps = np.asarray(to_list(self.pool_strides[i], self.n))
            cur = np.where(pk > 1, (cur - 1) * ps + pk, cur)
            k = np.asarray(to_list(self.kernel_sizes[i], self.n))
            d = np.asarray(to_list(self.dilations[i], self.n))
            s = np.asarray(to_list(self.strides[i], self.n))
            front, endc = self._crop(i)
            cur = (cur - 1) * s + d * (k - 1) + 1 - front - endc
            shapes.append(
                (batch, self._channels[i + 1]) + tuple(int(c) for c in cur))
        return shapes

    def _crop(self, i):
        """Per-axis (front, end) pad-crop of layer ``i``'s transpose
        conv, matching ``compute_transpose_out_size``."""
        k = to_list(self.kernel_sizes[i], self.n)
        d = to_list(self.dilations[i], self.n)
        s = to_list(self.strides[i], self.n)
        p = to_list(self.pad_types[i], self.n)
        front, endc = [], []
        for ki, di, si, pi in zip(k, d, s, p):
            f, e = compute_pad_size(ki, di, si, pi)
            front.append(f)
            endc.append(max(e - si + 1, 0))
        return np.asarray(front), np.asarray(endc)

    @classmethod
    def get_transpose_config(cls, config, transpose_config=None):
        assert config['factory'] == cls, (config['factory'], cls)
        forward_cls = CNN1d if cls is CNNTranspose1d else CNN2d
        return _mirror_stack_config(config, forward_cls, transpose_config)


class CNN1d(_CNN):
    n = 1
    conv_cls = Conv1d
    pool_cls = Pool1d

    @classmethod
    def get_transpose_config(cls, config, transpose_config=None):
        assert config['factory'] == cls, (config['factory'], cls)
        return _mirror_stack_config(config, CNNTranspose1d,
                                    transpose_config)


class CNN2d(_CNN):
    n = 2
    conv_cls = Conv2d
    pool_cls = Pool2d

    @classmethod
    def get_transpose_config(cls, config, transpose_config=None):
        assert config['factory'] == cls, (config['factory'], cls)
        return _mirror_stack_config(config, CNNTranspose2d,
                                    transpose_config)


class CNNTranspose1d(_CNNTranspose):
    n = 1
    conv_cls = ConvTranspose1d
    plain_conv_cls = Conv1d
    unpool_cls = Unpool1d


class CNNTranspose2d(_CNNTranspose):
    n = 2
    conv_cls = ConvTranspose2d
    plain_conv_cls = Conv2d
    unpool_cls = Unpool2d


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
