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

    #: kernel dispatch: ``None`` = auto (currently the XLA path —
    #: measured on v5e, XLA fuses the int8->bf16 convert+scale into the
    #: dot's operand read, so it already gets the int8 weight-bandwidth
    #: win, and inside a many-linear decode step the Pallas per-call
    #: launch overhead outweighs the kernel's remaining edge: whole-loop
    #: 582 us/step XLA vs 742 kernel on the d=1024/12-layer decoder,
    #: while ISOLATED GEMVs favor the kernel 1.1-1.5x — see
    #: doc/serving.md "Weight-only int8").  ``True`` forces the fused
    #: Pallas dequant-in-VMEM kernel (use for standalone bandwidth-bound
    #: GEMV call sites), ``False`` forces XLA, ``'interpret'`` runs the
    #: kernel on the Pallas CPU interpreter (tests).  Caveat: a
    #: forced-``True`` module baked into a multi-platform
    #: ``serve.export_model(platforms=('tpu', 'cpu'))`` artifact will
    #: only run on TPU.
    use_kernel = None
    # the kernel keeps the flattened x block VMEM-resident; cap it
    _KERNEL_MAX_ROWS = 1024

    def __init__(self, weight_q, scale, bias, in_features=None,
                 out_features=None):
        self.weight_q = weight_q          # (in[_pad], out[_pad]) int8
        self.scale = scale                # (out[_pad],) float32
        self.bias = bias                  # (out,) or None
        self.in_features = (weight_q.shape[0] if in_features is None
                            else in_features)
        self.out_features = (weight_q.shape[1] if out_features is None
                             else out_features)

    @classmethod
    def from_linear(cls, linear):
        w = jnp.asarray(linear.weight)    # (in, out)
        k, n = w.shape
        amax = jnp.max(jnp.abs(w), axis=0)            # per out channel
        scale = jnp.maximum(amax, 1e-12) / 127.0
        w_q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
        scale = scale.astype(jnp.float32)
        # pre-pad to the kernel's 128-lane tiles AT QUANTIZATION TIME
        # when the waste is small: the fused kernel then emits zero pad
        # ops per call (pads traced inside a decode loop are one HBM
        # copy per linear per step).  Small, badly-aligned layers keep
        # the logical layout (the wrapper pads per call) so the 4x
        # memory win is not eaten by tile waste.
        k_pad = -(-k // 128) * 128
        n_pad = -(-n // 128) * 128
        if (k_pad * n_pad) <= 1.25 * (k * n) and (k_pad, n_pad) != (k, n):
            w_q = jnp.pad(w_q, ((0, k_pad - k), (0, n_pad - n)))
            scale = jnp.pad(scale, (0, n_pad - n))
        return cls(w_q, scale, linear.bias,
                   in_features=k, out_features=n)

    def _dispatch_kernel(self, x):
        # auto (None) = XLA: its fused dequant already reads the weight
        # as int8 (measured — see the ``use_kernel`` doc above); the
        # kernel is an explicit opt-in for standalone GEMV call sites
        if self.use_kernel in (None, False):
            return False
        # True / 'interpret': respect the kernel's VMEM-resident x cap
        rows = 1
        for d in x.shape[:-1]:
            rows *= d
        return self.use_kernel if rows <= self._KERNEL_MAX_ROWS \
            else False

    def forward(self, x):
        if self._dispatch_kernel(x):
            from padertorch_tpu.ops.pallas.int8_matmul import int8_matmul
            # bias fused into the kernel; pre-padded weights pass
            # through with zero per-call pad ops
            return int8_matmul(
                x, self.weight_q, self.scale, self.bias,
                out_features=self.out_features,
                k_logical=self.in_features,
                interpret=self.use_kernel == 'interpret')
        w_q = self.weight_q[:self.in_features, :self.out_features]
        scale = self.scale[:self.out_features]
        y = x @ (w_q.astype(x.dtype) * scale.astype(x.dtype))
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
