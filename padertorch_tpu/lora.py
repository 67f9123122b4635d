"""LoRA adapters: parameter-efficient fine-tuning (Hu et al. 2021).

``y = x @ W + (alpha/r) * (x @ A) @ B`` with the base weight frozen (a
registered buffer — :func:`padertorch_tpu.module.partition` puts it in
the frozen tree, so the optimizer and ZeRO/FSDP sharding only ever see
the tiny A/B factors) and ``B`` zero-initialized, so fine-tuning starts
exactly at the pretrained model.

TPU note: the adapter path is two skinny matmuls (in->r, r->out)
fused by XLA alongside the frozen base matmul; at serving time
:func:`merge_lora` folds ``A @ B`` back into the dense weight so the
deployed artifact has zero adapter overhead (and composes with
``quantize_module`` / ``serve.export_model`` downstream).

No reference counterpart (the reference has no fine-tuning adapters);
built for the SSL models (wav2vec2/WavLM/HuBERT) whose full fine-tune
does not fit small TPU slices.

>>> import numpy as np
>>> import padertorch_tpu as pt
>>> from padertorch_tpu import nn, random as ptrandom
>>> from padertorch_tpu.module import partition
>>> ptrandom.seed(0)
>>> class Head(pt.Module):
...     def __init__(self):
...         self.lin = nn.Linear(16, 8)
...     def forward(self, x):
...         return self.lin(x)
>>> m = Head().eval()
>>> x = np.random.RandomState(0).randn(2, 16).astype('float32')
>>> before = np.asarray(m(x))
>>> apply_lora(m, rank=4)
1
>>> np.allclose(np.asarray(m(x)), before)  # B=0: starts at identity
True
>>> import jax
>>> trainable, frozen = partition(m)
>>> [l.shape for l in jax.tree_util.tree_leaves(trainable)]
[(16, 4), (4, 8)]
"""
import math

import jax
import jax.numpy as jnp

from padertorch_tpu.base import Module
from padertorch_tpu.module import swap_submodules
from padertorch_tpu import nn
from padertorch_tpu import random as ptrandom

__all__ = ['LoRALinear', 'apply_lora', 'merge_lora',
           'mark_only_lora_trainable']


class LoRALinear(Module):
    """``nn.Linear`` with a trainable low-rank delta on a frozen base."""

    def __init__(self, base, rank, alpha=None, dropout=0.0):
        self.in_features = base.in_features
        self.out_features = base.out_features
        self.rank = rank
        self.scaling = (alpha if alpha is not None else rank) / rank
        self.register_buffer('weight', base.weight)   # frozen (in, out)
        if base.bias is not None:
            self.register_buffer('bias', base.bias)
        else:
            self.bias = None
        # A: kaiming-uniform like the paper; B: zeros -> delta starts 0
        bound = 1.0 / math.sqrt(self.in_features)
        self.lora_a = jax.random.uniform(
            ptrandom.init_key(), (self.in_features, rank),
            minval=-bound, maxval=bound)
        self.lora_b = jnp.zeros((rank, self.out_features))
        self.dropout = nn.Dropout(dropout) if dropout else None

    def forward(self, x):
        y = x @ self.weight
        if self.bias is not None:
            y = y + self.bias
        h = self.dropout(x) if self.dropout is not None else x
        return y + (h @ self.lora_a) @ self.lora_b * self.scaling

    def merged(self):
        """Fold the adapter into a plain ``nn.Linear`` (serving)."""
        lin = object.__new__(nn.Linear)
        lin.in_features = self.in_features
        lin.out_features = self.out_features
        lin.weight = (self.weight
                      + self.lora_a @ self.lora_b * self.scaling)
        lin.bias = self.bias
        return lin

    def extra_repr(self):
        return (f'in_features={self.in_features}, '
                f'out_features={self.out_features}, rank={self.rank}')


def apply_lora(module, rank=8, alpha=None, dropout=0.0, targets=None):
    """Swap ``nn.Linear`` layers under ``module`` (in place) for
    :class:`LoRALinear`; returns how many were adapted.

    Args:
        targets: optional collection of attribute-name substrings to
            restrict adaptation (e.g. ``('q_proj', 'v_proj')`` — the
            LoRA-paper default for transformers).  ``None`` adapts
            every Linear.
    """
    def predicate(item, name):
        if not type(item) is nn.Linear:
            return False
        if targets is not None and not any(t in name for t in targets):
            return False
        return True

    return swap_submodules(
        module, predicate,
        lambda lin: LoRALinear(lin, rank, alpha=alpha, dropout=dropout))


def merge_lora(module):
    """Fold every adapter back into a dense ``nn.Linear`` (in place);
    returns how many were merged.  The result is adapter-free for
    serving/export and matches the adapted forward exactly."""
    return swap_submodules(
        module, lambda item, name: isinstance(item, LoRALinear),
        lambda l: l.merged())


def mark_only_lora_trainable(module):
    """Freeze every non-LoRA array in the tree (register as buffers),
    so :func:`padertorch_tpu.module.partition` yields ONLY the A/B
    factors as trainable — strict LoRA fine-tuning.  Returns the number
    of frozen array attributes."""
    count = 0

    def walk(mod):
        nonlocal count
        keep = ({'lora_a', 'lora_b'} if isinstance(mod, LoRALinear)
                else set())
        names = set(mod.buffer_names)
        for name, value in vars(mod).items():
            if name in keep or name in names:
                continue
            if hasattr(value, 'shape') and not isinstance(value, Module):
                names.add(name)
                count += 1
            elif isinstance(value, Module):
                walk(value)
            elif isinstance(value, (list, tuple)):
                for item in value:
                    if isinstance(item, Module):
                        walk(item)
            elif isinstance(value, dict):
                for item in value.values():
                    if isinstance(item, Module):
                        walk(item)
        mod.__dict__['_buffer_names'] = frozenset(names)

    walk(module)
    return count
