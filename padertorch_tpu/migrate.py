"""Import reference (fgnt/padertorch, PyTorch) checkpoints.

The reference Trainer saves torch checkpoints of the form
``{'model': state_dict, 'iteration': ..., 'optimizer': ..., 'hooks': ...}``
(reference ``padertorch/train/trainer.py:789-803``).  This module maps
those tensors onto the equivalent ``padertorch_tpu`` model so a user
switching frameworks can carry trained models over:

>>> import padertorch_tpu as pt                          # doctest: +SKIP
>>> model = pt.models.bss.PermutationInvariantTrainingModel()  # doctest: +SKIP
>>> sd = pt.migrate.load_torch_checkpoint('ckpt_best_loss.pth')  # doctest: +SKIP
>>> model = pt.migrate.import_torch_state_dict(model, sd)   # doctest: +SKIP

Layout translations applied per layer type (torch -> here):

- ``nn.Linear``: ``weight (out, in)`` -> ``(in, out)`` (transposed);
- ``nn.Conv1d/2d``: OIHW in both — copied as-is;
- ``nn.ConvTranspose1d/2d``: ``(in, out//g, *k)`` -> ``(out, in//g, *k)``;
- ``nn.LSTM``: ``weight_ih_l{k}[_reverse] (4H, in)`` -> ``w_ih.{i}
  (in, 4H)`` (transposed; same gate order i,f,g,o — pinned by
  ``tests/test_modules/test_recurrent.py``); the separate
  ``bias_ih/bias_hh`` pairs are summed into the single fused bias
  (exact: the LSTM cell only ever uses their sum);
- ``nn.GRU``: same mapping, but torch's ``b_hn`` enters the cell as
  ``r * b_hn`` which a fused bias cannot represent; the importer folds
  ``b_in + b_hn`` and warns unless ``b_hn`` is zero (exact otherwise);
- ``nn.Embedding`` / ``nn.LayerNorm``: copied as-is.

Model-specific checkpoint importers with their own key conventions
(HF wav2vec2/WavLM/HuBERT, NVIDIA BigVGAN, kan-bayashi PWG) live next
to their models under ``contrib/mk``.
"""
import warnings

import numpy as np

from padertorch_tpu import nn
from padertorch_tpu.module import Module, load_state_dict
from padertorch_tpu.modules.recurrent import _RNNBase, GRU

__all__ = [
    'load_torch_checkpoint',
    'convert_torch_state_dict',
    'import_torch_state_dict',
    'named_modules',
]


def load_torch_checkpoint(path, key='model'):
    """Load a torch checkpoint file into ``{name: numpy array}``.

    Reference-trainer checkpoints are unwrapped via ``key`` (set
    ``key=None`` for a bare ``state_dict`` file).
    """
    import torch
    try:
        ckpt = torch.load(path, map_location='cpu', weights_only=True)
    except Exception:
        ckpt = torch.load(path, map_location='cpu', weights_only=False)
    if key is not None and isinstance(ckpt, dict) \
            and isinstance(ckpt.get(key), dict):
        ckpt = ckpt[key]
    out = {}
    for k, v in ckpt.items():
        if hasattr(v, 'detach'):
            out[k] = v.detach().cpu().numpy()
        elif isinstance(v, (np.ndarray, float, int)):
            out[k] = np.asarray(v)
        # non-tensor trainer metadata is dropped
    return out


def named_modules(module, prefix=''):
    """Yield ``(dotted_name, Module)`` pairs, names matching the pytree
    paths used by :func:`padertorch_tpu.module.state_dict`."""
    yield prefix, module
    for name, obj in _named_children(module, prefix):
        yield from named_modules(obj, name)


def _named_children(obj, prefix):
    if isinstance(obj, Module):
        items = vars(obj).items()
    elif isinstance(obj, (list, tuple)):
        items = ((str(i), v) for i, v in enumerate(obj))
    elif isinstance(obj, dict):
        items = obj.items()
    else:
        return
    for name, v in items:
        child = f'{prefix}.{name}' if prefix else str(name)
        if isinstance(v, Module):
            yield child, v
        elif isinstance(v, (list, tuple, dict)):
            yield from _named_children(v, child)


def convert_torch_state_dict(model, torch_sd, *, prefix_map=None):
    """Translate a torch ``state_dict`` into this framework's naming and
    layouts for ``model``.

    Args:
        model: the target module tree (defines names and layer types).
        torch_sd: ``{torch_name: numpy array}``.
        prefix_map: optional ``{our_prefix: torch_prefix}`` for renamed
            submodules (longest our-prefix wins; '' maps the root).

    Returns:
        ``(state_dict, consumed)`` — arrays keyed by our dotted names,
        plus the set of torch keys that were consumed.
    """
    prefix_map = dict(prefix_map or {})
    out, consumed = {}, set()

    def t_name(our_name):
        best = None
        for ours, theirs in prefix_map.items():
            if our_name == ours or our_name.startswith(ours + '.') \
                    or ours == '':
                if best is None or len(ours) > len(best[0]):
                    best = (ours, theirs)
        if best is None:
            return our_name
        ours, theirs = best
        suffix = our_name[len(ours):].lstrip('.')
        return f'{theirs}.{suffix}'.strip('.') if suffix else theirs

    def take(name):
        if name in torch_sd:
            consumed.add(name)
            return np.asarray(torch_sd[name])
        return None

    def j(name, param):
        return f'{name}.{param}' if name else param

    for name, mod in named_modules(model):
        base = t_name(name)
        dot = f'{base}.' if base else ''
        if isinstance(mod, _RNNBase):
            _convert_rnn(mod, name, dot, take, out, j)
        elif isinstance(mod, nn.Linear):
            w = take(f'{dot}weight')
            if w is not None:
                out[j(name, 'weight')] = w.T
            b = take(f'{dot}bias')
            if b is not None and mod.bias is not None:
                out[j(name, 'bias')] = b
        elif isinstance(mod, (nn.ConvTranspose1d, nn.ConvTranspose2d)):
            w = take(f'{dot}weight')
            if w is not None:
                # torch (in, out//g, *k) -> ours (out, in//g, *k)
                out[j(name, 'weight')] = np.swapaxes(w, 0, 1)
            b = take(f'{dot}bias')
            if b is not None and mod.bias is not None:
                out[j(name, 'bias')] = b
        elif isinstance(mod, (nn.Conv1d, nn.Conv2d, nn.Embedding,
                              nn.LayerNorm)):
            for p in ('weight', 'bias'):
                v = take(f'{dot}{p}')
                if v is not None and getattr(mod, p, None) is not None:
                    out[j(name, p)] = v
    return out, consumed


def _convert_rnn(mod, name, dot, take, out, j):
    g = mod.gates
    h = mod.hidden_size
    num_directions = 2 if mod.bidirectional else 1
    for layer in range(mod.num_layers):
        for d in range(num_directions):
            i = layer * num_directions + d
            suffix = '_reverse' if d == 1 else ''
            w_ih = take(f'{dot}weight_ih_l{layer}{suffix}')
            w_hh = take(f'{dot}weight_hh_l{layer}{suffix}')
            if w_ih is not None:
                out[j(name, f'w_ih.{i}')] = w_ih.T
            if w_hh is not None:
                out[j(name, f'w_hh.{i}')] = w_hh.T
            b_ih = take(f'{dot}bias_ih_l{layer}{suffix}')
            b_hh = take(f'{dot}bias_hh_l{layer}{suffix}')
            if b_ih is None and b_hh is None:
                continue
            b_ih = np.zeros(g * h, 'float32') if b_ih is None else b_ih
            b_hh = np.zeros(g * h, 'float32') if b_hh is None else b_hh
            if isinstance(mod, GRU):
                # the n-gate's hidden bias enters the torch cell as
                # r * b_hn — a fused bias is exact only when b_hn == 0;
                # fold it (r averages ~0.5) and warn otherwise
                b_hn = b_hh[2 * h:]
                if np.abs(b_hn).max() > 0:
                    warnings.warn(
                        f'{name}: GRU import is approximate — torch '
                        f'b_hn (max |{np.abs(b_hn).max():.3g}|) is '
                        f'folded into the fused bias but the cell '
                        f'applies it without the reset gate.')
            if mod.b[i] is not None:
                out[j(name, f'b.{i}')] = b_ih + b_hh


def import_torch_state_dict(model, torch_sd, *, prefix_map=None,
                            strict=True):
    """Return a copy of ``model`` with parameters from a torch
    ``state_dict`` (see :func:`convert_torch_state_dict` for layouts).

    ``strict=True`` raises if any torch tensor went unconsumed
    (typo'd prefixes, structural mismatch); parameters of ``model``
    that have no torch counterpart keep their values either way.
    """
    sd, consumed = convert_torch_state_dict(
        model, torch_sd, prefix_map=prefix_map)
    if strict:
        unconsumed = sorted(
            k for k in torch_sd
            if k not in consumed and not k.endswith('num_batches_tracked'))
        if unconsumed:
            raise KeyError(
                f'import_torch_state_dict: torch keys without a target '
                f'in the model: {unconsumed[:10]}'
                f'{" ..." if len(unconsumed) > 10 else ""} — pass '
                f'prefix_map to rename, or strict=False to ignore.')
        if not sd:
            raise KeyError('import_torch_state_dict: nothing matched.')
    return load_state_dict(model, sd, strict=False)
