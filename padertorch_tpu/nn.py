"""Primitive neural network layers (the ``torch.nn`` analog).

The reference builds on torch.nn; this framework provides its own pytree
layer library.  Design choices for TPU:

- ``Linear`` stores its weight as ``(in_features, out_features)`` so the
  forward is a direct ``x @ W`` feeding the MXU without a transpose.
- Convolutions use ``lax.conv_general_dilated``; XLA tiles them onto the
  MXU.  The public API is channels-first ``(B, C, T)`` to match the
  reference's model code.
- ``Dropout`` draws keys from the trainer-provided
  ``padertorch_tpu.random.key_context`` so ``forward(example)`` needs no
  explicit key argument.
"""
import math

import jax
import jax.numpy as jnp
from jax import lax

from padertorch_tpu.module import Module
from padertorch_tpu import random as ptrandom
from padertorch_tpu.utils.misc import to_list

__all__ = [
    'Linear',
    'Dropout',
    'Embedding',
    'Sequential',
    'Identity',
    'Conv1d',
    'ConvTranspose1d',
    'Conv2d',
    'ConvTranspose2d',
    'LayerNorm',
    'ReLU', 'LeakyReLU', 'ELU', 'GELU', 'Sigmoid', 'Tanh', 'Softmax',
    'PReLU', 'GLU', 'SiLU',
]


class Linear(Module):
    """Affine layer ``y = x @ W + b``; W is ``(in_features, out_features)``."""

    def __init__(self, in_features, out_features, bias=True,
                 dtype='float32'):
        self.in_features = in_features
        self.out_features = out_features
        bound = 1.0 / math.sqrt(in_features)
        self.weight = jax.random.uniform(
            ptrandom.init_key(), (in_features, out_features),
            minval=-bound, maxval=bound, dtype=dtype)
        if bias:
            self.bias = jax.random.uniform(
                ptrandom.init_key(), (out_features,),
                minval=-bound, maxval=bound, dtype=dtype)
        else:
            self.bias = None

    def forward(self, x):
        y = x @ self.weight
        if self.bias is not None:
            y = y + self.bias
        return y

    def extra_repr(self):
        return (f'in_features={self.in_features}, '
                f'out_features={self.out_features}, '
                f'bias={self.bias is not None}')


class Dropout(Module):
    """Inverted dropout; identity in eval mode.

    Keys come from the ambient :func:`padertorch_tpu.random.key_context`.
    """

    def __init__(self, p=0.5):
        assert 0 <= p < 1, p
        self.p = p

    def forward(self, x):
        if not self.training or self.p == 0:
            return x
        keep = 1.0 - self.p
        mask = jax.random.bernoulli(ptrandom.next_key(), keep, jnp.shape(x))
        return jnp.where(mask, x / keep, 0).astype(x.dtype)

    def extra_repr(self):
        return f'p={self.p}'


class Embedding(Module):
    def __init__(self, num_embeddings, embedding_dim, dtype='float32'):
        self.num_embeddings = num_embeddings
        self.embedding_dim = embedding_dim
        self.weight = jax.random.normal(
            ptrandom.init_key(), (num_embeddings, embedding_dim),
            dtype=dtype)

    def forward(self, ids):
        return jnp.take(self.weight, ids, axis=0)


class Sequential(Module):
    """Chain of callables (modules or plain functions)."""

    def __init__(self, *layers):
        if len(layers) == 1 and isinstance(layers[0], (list, tuple)):
            layers = tuple(layers[0])
        self.layers = list(layers)

    def forward(self, x, *args, **kwargs):
        for layer in self.layers:
            x = layer(x, *args, **kwargs) if isinstance(layer, Module) \
                and _wants_extra_args(layer) else layer(x)
        return x

    def __iter__(self):
        return iter(self.layers)

    def __getitem__(self, idx):
        return self.layers[idx]

    def __len__(self):
        return len(self.layers)

    def append(self, layer):
        self.layers.append(layer)
        return self


def _wants_extra_args(layer):
    return False  # layers in a Sequential receive only the running value


class Identity(Module):
    def forward(self, x):
        return x


def _to_lax_padding(padding, kernel_size, dilation, n):
    """Convert torch-style int/tuple padding to lax ((lo, hi), ...)."""
    if isinstance(padding, str):
        return padding.upper()  # 'SAME' / 'VALID'
    padding = to_list(padding, n)
    return tuple((p, p) for p in padding)


class _ConvNd(Module):
    n: int = 1

    def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                 padding=0, dilation=1, groups=1, bias=True,
                 dtype='float32'):
        n = self.n
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = tuple(to_list(kernel_size, n))
        self.stride = tuple(to_list(stride, n))
        self.padding = padding
        self.dilation = tuple(to_list(dilation, n))
        self.groups = groups
        assert in_channels % groups == 0, (in_channels, groups)
        assert out_channels % groups == 0, (out_channels, groups)
        fan_in = (in_channels // groups) * math.prod(self.kernel_size)
        bound = 1.0 / math.sqrt(fan_in)
        # OIH(W) layout: (out_channels, in_channels // groups, *kernel)
        self.weight = jax.random.uniform(
            ptrandom.init_key(),
            (out_channels, in_channels // groups, *self.kernel_size),
            minval=-bound, maxval=bound, dtype=dtype)
        self.bias = jax.random.uniform(
            ptrandom.init_key(), (out_channels,),
            minval=-bound, maxval=bound, dtype=dtype) if bias else None

    def _dn(self):
        spatial = 'HWD'[:self.n]
        return lax.conv_dimension_numbers(
            (1, self.in_channels) + (1,) * self.n,
            self.weight.shape,
            (f'NC{spatial}', f'OI{spatial}', f'NC{spatial}'),
        )

    def extra_repr(self):
        return (f'{self.in_channels}, {self.out_channels}, '
                f'kernel_size={self.kernel_size}, stride={self.stride}')


class _Conv(_ConvNd):
    def forward(self, x):
        pad = _to_lax_padding(
            self.padding, self.kernel_size, self.dilation, self.n)
        y = lax.conv_general_dilated(
            x, self.weight,
            window_strides=self.stride,
            padding=pad,
            rhs_dilation=self.dilation,
            dimension_numbers=self._dn(),
            feature_group_count=self.groups,
            preferred_element_type=x.dtype,
        )
        if self.bias is not None:
            y = y + self.bias.reshape((1, -1) + (1,) * self.n)
        return y


class Conv1d(_Conv):
    """1-D convolution over (B, C, T)."""
    n = 1


class Conv2d(_Conv):
    """2-D convolution over (B, C, H, W)."""
    n = 2


class _ConvTranspose(_ConvNd):
    def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                 padding=0, dilation=1, groups=1, bias=True,
                 dtype='float32'):
        super().__init__(
            in_channels, out_channels, kernel_size, stride=stride,
            padding=padding, dilation=dilation, groups=groups, bias=bias,
            dtype=dtype)
        # Transposed conv weight in torch is (in, out//groups, *k); we keep
        # OIH = (out, in//groups, *k) and use lax transpose semantics.

    def forward(self, x):
        n = self.n
        if self.groups != 1:
            raise NotImplementedError(
                'Grouped transposed convolution is not implemented yet.')
        # torch-exact transposed conv: fractionally-strided conv
        # (lhs_dilation = stride) with the spatially flipped kernel and
        # padding d*(k-1) - p on both sides.
        pad_torch = to_list(
            0 if isinstance(self.padding, str) else self.padding, n)
        pads = tuple(
            (self.dilation[i] * (self.kernel_size[i] - 1) - pad_torch[i],) * 2
            for i in range(n)
        )
        spatial_axes = tuple(range(2, 2 + n))
        weight = jnp.flip(self.weight, axis=spatial_axes)
        y = lax.conv_general_dilated(
            x, weight,
            window_strides=(1,) * n,
            padding=pads,
            lhs_dilation=self.stride,
            rhs_dilation=self.dilation,
            dimension_numbers=self._dn(),
            preferred_element_type=x.dtype,
        )
        if self.bias is not None:
            y = y + self.bias.reshape((1, -1) + (1,) * n)
        return y


class ConvTranspose1d(_ConvTranspose):
    n = 1


class ConvTranspose2d(_ConvTranspose):
    n = 2


class LayerNorm(Module):
    def __init__(self, normalized_shape, eps=1e-5, elementwise_affine=True,
                 dtype='float32'):
        if isinstance(normalized_shape, int):
            normalized_shape = (normalized_shape,)
        self.normalized_shape = tuple(normalized_shape)
        self.eps = eps
        if elementwise_affine:
            self.weight = jnp.ones(self.normalized_shape, dtype=dtype)
            self.bias = jnp.zeros(self.normalized_shape, dtype=dtype)
        else:
            self.weight = None
            self.bias = None

    def forward(self, x):
        axes = tuple(range(x.ndim - len(self.normalized_shape), x.ndim))
        mean = jnp.mean(x, axis=axes, keepdims=True)
        var = jnp.var(x, axis=axes, keepdims=True)
        y = (x - mean) * lax.rsqrt(var + self.eps)
        if self.weight is not None:
            y = y * self.weight + self.bias
        return y


class RMSNorm(Module):
    """Root-mean-square norm (Zhang & Sennrich 2019), torch.nn.RMSNorm
    semantics: no mean subtraction, learnable scale, no bias."""

    def __init__(self, normalized_shape, eps=1e-6,
                 elementwise_affine=True, dtype='float32'):
        if isinstance(normalized_shape, int):
            normalized_shape = (normalized_shape,)
        self.normalized_shape = tuple(normalized_shape)
        self.eps = eps
        self.weight = (jnp.ones(self.normalized_shape, dtype=dtype)
                       if elementwise_affine else None)

    def forward(self, x):
        axes = tuple(range(x.ndim - len(self.normalized_shape), x.ndim))
        ms = jnp.mean(jnp.square(x), axis=axes, keepdims=True)
        y = x * lax.rsqrt(ms + self.eps)
        if self.weight is not None:
            y = y * self.weight
        return y


def _act_module(name, fn, **params):
    def __init__(self, **kwargs):
        for k, v in {**params, **kwargs}.items():
            setattr(self, k, v)

    def forward(self, x):
        return fn(self, x)

    return type(name, (Module,), {'__init__': __init__, 'forward': forward})


ReLU = _act_module('ReLU', lambda self, x: jax.nn.relu(x))
LeakyReLU = _act_module(
    'LeakyReLU',
    lambda self, x: jax.nn.leaky_relu(x, self.negative_slope),
    negative_slope=0.01)
ELU = _act_module('ELU', lambda self, x: jax.nn.elu(x, self.alpha), alpha=1.0)
GELU = _act_module('GELU', lambda self, x: jax.nn.gelu(x))
Sigmoid = _act_module('Sigmoid', lambda self, x: jax.nn.sigmoid(x))
Tanh = _act_module('Tanh', lambda self, x: jnp.tanh(x))
SiLU = _act_module('SiLU', lambda self, x: jax.nn.silu(x))
Softmax = _act_module(
    'Softmax', lambda self, x: jax.nn.softmax(x, axis=self.axis), axis=-1)
GLU = _act_module(
    'GLU', lambda self, x: jax.nn.glu(x, axis=self.axis), axis=-2)


class PReLU(Module):
    def __init__(self, num_parameters=1, init=0.25, dtype='float32'):
        self.weight = jnp.full((num_parameters,), init, dtype=dtype)

    def forward(self, x):
        a = self.weight
        if a.shape[0] != 1 and x.ndim >= 2:
            # channel axis is 1 for (B, C, ...) tensors
            a = a.reshape((1, -1) + (1,) * (x.ndim - 2))
        return jnp.where(x >= 0, x, a * x)
