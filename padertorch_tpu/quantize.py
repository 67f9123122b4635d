"""Weight-only int8 quantization for serving.

TPU-native rationale: serving decode loops are HBM-bandwidth-bound —
every step re-reads the weights — so shrinking the resident weights 4x
(f32 -> int8 + one f32 scale per output channel) is a direct
bandwidth/footprint win, while the matmul itself stays in bf16/f32 on
the MXU (the dequantize is an elementwise convert+multiply that XLA
fuses into the dot's operand read).  Symmetric per-output-channel
scales keep the error small without zero points.

No reference counterpart (the reference has no serving/quantization
story); this is the deployment-side complement to ``serve.py``.

Eval/export only: the int8 leaves are not differentiable — quantize a
trained model right before export, never before training.

>>> import numpy as np
>>> import padertorch_tpu as pt
>>> from padertorch_tpu import nn, random as ptrandom
>>> ptrandom.seed(0)
>>> class Head(pt.Module):
...     def __init__(self):
...         self.lin = nn.Linear(64, 32)
...     def forward(self, x):
...         return self.lin(x)
>>> m = Head().eval()
>>> x = np.random.RandomState(0).randn(4, 64).astype('float32')
>>> want = np.asarray(m(x))
>>> quantize_module(m)
1
>>> got = np.asarray(m(x))
>>> bool(np.abs(got - want).max() < np.abs(want).max() * 0.02)
True
"""
import jax
import jax.numpy as jnp
import numpy as np

from padertorch_tpu.base import Module
from padertorch_tpu.module import swap_submodules
from padertorch_tpu import nn

__all__ = ['QuantizedLinear', 'quantize_module', 'quantization_error']


class QuantizedLinear(Module):
    """Drop-in serving replacement for :class:`nn.Linear`.

    Stores the weight as int8 with a float32 scale per output channel
    (symmetric: ``w ~ w_q * scale``); the forward dequantizes on the
    fly, so downstream code (export, jit, pytree partition) sees an
    ordinary module.
    """

    #: kernel dispatch: ``None`` = auto (fused Pallas dequant-matmul on
    #: TPU at serving batch sizes, XLA path otherwise), ``True``/
    #: ``False`` force, ``'interpret'`` runs the kernel on the Pallas
    #: CPU interpreter (tests). The kernel reads the weight from HBM as int8
    #: and dequantizes in VMEM — the actual 4x bandwidth win at decode
    #: (see ``ops/pallas/int8_matmul.py`` and doc/serving.md). Caveat:
    #: a forced-``True`` module baked into a multi-platform
    #: ``serve.export_model(platforms=('tpu', 'cpu'))`` artifact will
    #: only run on TPU.
    use_kernel = None
    # above this many flattened input rows the dot is compute-bound and
    # XLA's path is fine; it also bounds the kernel's VMEM-resident x
    _KERNEL_MAX_ROWS = 1024

    def __init__(self, weight_q, scale, bias):
        self.weight_q = weight_q          # (in, out) int8
        self.scale = scale                # (out,) float32
        self.bias = bias                  # (out,) or None
        self.in_features = weight_q.shape[0]
        self.out_features = weight_q.shape[1]

    @classmethod
    def from_linear(cls, linear):
        w = jnp.asarray(linear.weight)    # (in, out)
        amax = jnp.max(jnp.abs(w), axis=0)            # per out channel
        scale = jnp.maximum(amax, 1e-12) / 127.0
        w_q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
        return cls(w_q, scale.astype(jnp.float32), linear.bias)

    def _dispatch_kernel(self, x):
        if self.use_kernel is not None:
            return self.use_kernel
        rows = 1
        for d in x.shape[:-1]:
            rows *= d
        return (jax.default_backend() == 'tpu'
                and rows <= self._KERNEL_MAX_ROWS)

    def forward(self, x):
        if self._dispatch_kernel(x):
            from padertorch_tpu.ops.pallas.int8_matmul import int8_matmul
            y = int8_matmul(x, self.weight_q, self.scale,
                            interpret=self.use_kernel == 'interpret')
        else:
            w = self.weight_q.astype(x.dtype) * self.scale.astype(x.dtype)
            y = x @ w
        if self.bias is not None:
            y = y + self.bias
        return y

    def extra_repr(self):
        return (f'in_features={self.in_features}, '
                f'out_features={self.out_features}, int8')


def quantize_module(module, min_params=256):
    """Swap every :class:`nn.Linear` under ``module`` (in place) for a
    :class:`QuantizedLinear`; returns how many were swapped.

    ``min_params``: skip layers smaller than this (their scales/bias
    overhead outweighs the saving and small heads are accuracy-
    sensitive).
    """
    return swap_submodules(
        module,
        lambda item, name: (type(item) is nn.Linear
                            and item.weight.size >= min_params),
        QuantizedLinear.from_linear)


def quantization_error(module, quantized, example):
    """Max relative output error of ``quantized`` vs ``module`` on an
    example input — a pre-export sanity number."""
    a = np.asarray(jax.tree_util.tree_leaves(module(example))[0])
    b = np.asarray(jax.tree_util.tree_leaves(quantized(example))[0])
    denom = np.abs(a).max() + 1e-12
    return float(np.abs(a - b).max() / denom)
