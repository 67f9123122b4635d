"""Pytree-registered module system — the TPU-native answer to ``pt.Module``.

Design (vs. reference ``padertorch/base.py:55``): instead of torch's stateful
``nn.Module``, a ``Module`` here is a **pytree**: array-valued attributes are
dynamic leaves that flow through ``jit``/``grad``/``vmap``; everything else is
static metadata that keys the XLA compilation cache.  ``partition``/
``combine`` split a module into (trainable params, frozen rest) so that
``jax.value_and_grad`` differentiates exactly the trainable leaves — buffers
(e.g. running norm statistics) are carried but not differentiated.

This keeps the reference's user API (attributes assigned in ``__init__``,
``model.train()`` / ``model.eval()``, ``state_dict`` with dotted names) while
the compute path is purely functional under XLA.
"""
import threading
import numpy as np

import jax
import jax.numpy as jnp
from jax.tree_util import GetAttrKey, SequenceKey, DictKey

from padertorch_tpu.configurable import Configurable

__all__ = [
    'Module',
    'partition',
    'combine',
    'state_dict',
    'load_state_dict',
    'num_parameters',
    'is_array',
    'is_inexact_array',
    'swap_submodules',
]


def is_array(x):
    return isinstance(x, (jax.Array, np.ndarray))


def is_inexact_array(x):
    return is_array(x) and jnp.issubdtype(x.dtype, jnp.inexact)


def _is_dynamic(v):
    """Classify an attribute value as pytree-dynamic (traced) or static.

    A bare ``None`` attribute counts as dynamic (an empty pytree) so that
    ``partition`` can place ``None`` markers at frozen leaf positions
    without changing the treedef — the key invariant behind ``combine``.
    Containers are dynamic only if they actually hold arrays/Modules
    somewhere (a dict of config strings with None values must stay static).
    """
    if v is None:
        return True
    return _contains_dynamic(v)


class _Masked:
    """Placeholder at partitioned-out leaf positions.

    An *empty* pytree (no leaves) that — unlike ``None`` — keeps its
    enclosing container classified as dynamic, so the treedefs of the two
    partition twins always match.
    """
    __slots__ = ()

    def __repr__(self):
        return '<masked>'

    def __eq__(self, other):
        return isinstance(other, _Masked)

    def __hash__(self):
        return hash(_Masked)


jax.tree_util.register_pytree_node(
    _Masked,
    lambda m: ((), None),
    lambda aux, children: _MASKED,
)

_MASKED = _Masked()


def _is_placeholder(v):
    return v is None or isinstance(v, _Masked)


def _contains_dynamic(v):
    if isinstance(v, (jax.Array, np.ndarray, Module, _Masked)):
        return True
    if isinstance(v, (list, tuple)):
        return any(_contains_dynamic(e) for e in v)
    if isinstance(v, dict):
        return any(_contains_dynamic(e) for e in v.values())
    return False


def _freeze(v):
    """Hashable, eq-comparable image of a static value (for the jit cache)."""
    if isinstance(v, dict):
        return ('__dict__',) + tuple(
            (k, _freeze(val)) for k, val in v.items())
    if isinstance(v, (list, tuple)):
        return ('__seq__', type(v).__name__) + tuple(_freeze(e) for e in v)
    if isinstance(v, set):
        return ('__set__', frozenset(_freeze(e) for e in v))
    if isinstance(v, np.generic):
        return v.item()
    try:
        hash(v)
        return v
    except TypeError:
        raise TypeError(
            f'Static module attribute of type {type(v).__name__} is not '
            f'hashable: {v!r}. Store arrays as jnp arrays (dynamic) or use '
            f'hashable metadata.'
        ) from None


class _StaticAux:
    """Aux data for Module flattening: raw statics + hashable identity."""
    __slots__ = ('cls_dict', 'dynamic_keys', '_frozen', '_hash')

    def __init__(self, cls_dict, dynamic_keys):
        self.cls_dict = cls_dict
        self.dynamic_keys = dynamic_keys
        self._frozen = (dynamic_keys, _freeze(cls_dict))
        self._hash = hash(self._frozen)

    def __hash__(self):
        return self._hash

    def __eq__(self, other):
        return (
            isinstance(other, _StaticAux) and self._frozen == other._frozen
        )


class Module(Configurable):
    """Base class for all trainable components (pytree-registered).

    Reference parity: ``padertorch/base.py:55`` — but as a functional pytree.
    Subclasses assign parameters (jnp arrays), sub-modules, and static
    hyperparameters as attributes in ``__init__`` and implement ``forward``
    (or ``__call__``).

    Non-trainable arrays (running statistics etc.) are declared with
    ``self.register_buffer('name', value)``.
    """

    _training: bool = True

    def __init_subclass__(cls, **kwargs):
        super().__init_subclass__(**kwargs)
        jax.tree_util.register_pytree_with_keys(
            cls,
            cls._tree_flatten_with_keys,
            cls._tree_unflatten,
            flatten_func=cls._tree_flatten,
        )

    # -- pytree protocol ----------------------------------------------------
    def _split_attrs(self):
        dynamic = []
        static = {}
        for k, v in self.__dict__.items():
            if _is_dynamic(v):
                dynamic.append((k, v))
            else:
                static[k] = v
        return dynamic, static

    def _tree_flatten(self):
        dynamic, static = self._split_attrs()
        keys = tuple(k for k, _ in dynamic)
        children = tuple(v for _, v in dynamic)
        return children, _StaticAux(static, keys)

    def _tree_flatten_with_keys(self):
        dynamic, static = self._split_attrs()
        keys = tuple(k for k, _ in dynamic)
        children = tuple((GetAttrKey(k), v) for k, v in dynamic)
        return children, _StaticAux(static, keys)

    @classmethod
    def _tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj.__dict__.update(aux.cls_dict)
        for k, v in zip(aux.dynamic_keys, children):
            obj.__dict__[k] = v
        return obj

    # -- torch-like conveniences ---------------------------------------------
    def register_buffer(self, name, value):
        """Mark ``name`` as a non-trainable array attribute."""
        buffers = set(self.__dict__.get('_buffer_names', ()))
        buffers.add(name)
        self.__dict__['_buffer_names'] = frozenset(buffers)
        setattr(self, name, value)

    @property
    def buffer_names(self):
        return self.__dict__.get('_buffer_names', frozenset())

    @property
    def training(self):
        return self.__dict__.get('_training', type(self)._training)

    def train(self, mode=True):
        """Recursively set training mode (in place, like torch).

        Note: flipping the mode changes the static pytree structure, so the
        next jitted call retraces (two cached programs: train and eval).
        """
        def visit(obj):
            if isinstance(obj, Module):
                obj.__dict__['_training'] = mode
                for v in obj.__dict__.values():
                    visit(v)
            elif isinstance(obj, (list, tuple)):
                for v in obj:
                    visit(v)
            elif isinstance(obj, dict):
                for v in obj.values():
                    visit(v)
        visit(self)
        return self

    def eval(self):
        return self.train(False)

    def forward(self, *args, **kwargs):
        raise NotImplementedError(
            f'{type(self).__name__} must implement forward().')

    def __call__(self, *args, **kwargs):
        return self.forward(*args, **kwargs)

    def modules(self):
        """Iterate over (dotted_name, module) pairs, including self as ''."""
        def visit(obj, prefix):
            if isinstance(obj, Module):
                yield prefix, obj
                for k, v in obj.__dict__.items():
                    yield from visit(v, f'{prefix}.{k}' if prefix else k)
            elif isinstance(obj, (list, tuple)):
                for i, v in enumerate(obj):
                    yield from visit(v, f'{prefix}.{i}')
            elif isinstance(obj, dict):
                for k, v in obj.items():
                    yield from visit(v, f'{prefix}.{k}')
        yield from visit(self, '')

    def parameters(self):
        """Flat list of trainable parameter arrays."""
        params, _ = partition(self)
        return [x for x in jax.tree_util.tree_leaves(params)]

    def num_parameters(self):
        return num_parameters(self)

    def extra_repr(self):
        return ''

    def __repr__(self):
        try:
            n = self.num_parameters()
            extra = self.extra_repr()
            inner = ', '.join(filter(None, [extra, f'parameters={n}']))
        except Exception:
            inner = self.extra_repr()
        return f'{type(self).__name__}({inner})'

    # -- state dict -----------------------------------------------------------
    def state_dict(self):
        return state_dict(self)

    def load_state_dict(self, sd):
        """Return a copy of self with arrays replaced from ``sd``."""
        return load_state_dict(self, sd)


def _key_str(k):
    if isinstance(k, GetAttrKey):
        return k.name
    if isinstance(k, SequenceKey):
        return str(k.idx)
    if isinstance(k, DictKey):
        return str(k.key)
    return str(k)


def state_dict(tree):
    """Flatten all arrays of a pytree into a dict with dotted names.

    Mirrors torch's ``state_dict`` contract used throughout the reference
    (``padertorch/base.py:123``, ``train/trainer.py:789``).
    """
    out = {}
    paths = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in paths:
        name = '.'.join(_key_str(k) for k in path)
        out[name] = np.asarray(leaf)
    return out


def load_state_dict(tree, sd, strict=True):
    """Inverse of :func:`state_dict`: returns a copy with arrays replaced."""
    paths, treedef = jax.tree_util.tree_flatten_with_path(tree)
    leaves = []
    missing = []
    used = set()
    for path, leaf in paths:
        name = '.'.join(_key_str(k) for k in path)
        if name in sd:
            new = jnp.asarray(sd[name])
            if strict and is_array(leaf) and tuple(new.shape) != tuple(
                    jnp.shape(leaf)):
                raise ValueError(
                    f'Shape mismatch for {name!r}: checkpoint '
                    f'{tuple(new.shape)} vs model {tuple(jnp.shape(leaf))}')
            leaves.append(new.astype(leaf.dtype) if is_array(leaf) else leaf)
            used.add(name)
        else:
            missing.append(name)
            leaves.append(leaf)
    if strict:
        unexpected = set(sd) - used
        if missing or unexpected:
            raise KeyError(
                f'load_state_dict: missing keys {missing}, '
                f'unexpected keys {sorted(unexpected)}')
    return jax.tree_util.tree_unflatten(treedef, leaves)


def _replace_leaves_with_none(tree):
    return jax.tree_util.tree_map(lambda _: None, tree)


def partition(module, trainable_filter=None):
    """Split a pytree into (trainable, frozen) trees of identical structure.

    Frozen positions hold ``None`` in the trainable tree and vice versa
    (equinox-style).  By default trainable = inexact-dtype arrays that are
    not registered buffers; integer/bool arrays and buffers are frozen.
    """
    if trainable_filter is None:
        trainable_filter = is_inexact_array

    def split(obj, frozen_by_parent=False):
        if isinstance(obj, Module):
            buffers = obj.buffer_names
            t_over, f_over = {}, {}
            for name, v in obj.__dict__.items():
                if not _is_dynamic(v):
                    continue
                t, f = split(v, frozen_by_parent or (name in buffers))
                t_over[name] = t
                f_over[name] = f
            return _clone_with(obj, t_over), _clone_with(obj, f_over)
        if isinstance(obj, (list, tuple)):
            pairs = [split(v, frozen_by_parent) for v in obj]
            return (type(obj)(p[0] for p in pairs),
                    type(obj)(p[1] for p in pairs))
        if isinstance(obj, dict):
            pairs = {k: split(v, frozen_by_parent) for k, v in obj.items()}
            return ({k: p[0] for k, p in pairs.items()},
                    {k: p[1] for k, p in pairs.items()})
        # leaf
        if obj is None:
            return None, None
        if not frozen_by_parent and trainable_filter(obj):
            return obj, _MASKED
        return _MASKED, obj

    return split(module)


def _clone_with(module, overrides):
    obj = object.__new__(type(module))
    obj.__dict__.update(module.__dict__)
    obj.__dict__.update(overrides)
    return obj


def combine(*trees):
    """Merge partitioned trees: first non-placeholder leaf wins."""
    def merge(*vals):
        for v in vals:
            if not _is_placeholder(v):
                return v
        return None

    return jax.tree_util.tree_map(
        merge, *trees, is_leaf=_is_placeholder)


def num_parameters(tree):
    """Total number of trainable parameter elements.

    Reference parity: ``padertorch/summary/model_info.py:37``.
    """
    params, _ = partition(tree)
    return int(sum(
        np.prod(np.shape(x)) for x in jax.tree_util.tree_leaves(params)))


def inplace_update(module, *trees):
    """Write the non-None dynamic leaves of partitioned ``trees`` back into
    ``module`` **in place** (preserving object identity, so host-side flags
    like ``create_snapshot`` survive while device arrays advance each step).
    """
    def visit(obj, *srcs):
        srcs = [s for s in srcs if not _is_placeholder(s)]
        if isinstance(obj, Module):
            for name, v in obj.__dict__.items():
                if not _is_dynamic(v):
                    continue
                obj.__dict__[name] = visit(
                    v, *[getattr(s, name, None) for s in srcs])
            return obj
        if isinstance(obj, (list, tuple)):
            return type(obj)(
                visit(v, *[s[i] for s in srcs])
                for i, v in enumerate(obj)
            )
        if isinstance(obj, dict):
            return {
                k: visit(v, *[s.get(k) for s in srcs])
                for k, v in obj.items()
            }
        for s in srcs:
            if not _is_placeholder(s):
                return s
        return obj

    return visit(module, *trees)


def swap_submodules(module, predicate, convert):
    """Walk ``module``'s tree in place, replacing every sub-module for
    which ``predicate(submodule, attr_name)`` is true with
    ``convert(submodule)``; recurses into attributes, lists, tuples and
    dicts.  Returns how many were swapped.  (The shared machinery under
    ``lora.apply_lora``/``merge_lora`` and ``quantize.quantize_module``.)
    """
    count = 0

    def maybe(item, name):
        nonlocal count
        if predicate(item, name):
            count += 1
            return convert(item)
        if isinstance(item, Module):
            walk(item)
        return item

    def walk(mod):
        for name, value in list(vars(mod).items()):
            if isinstance(value, Module):
                new = maybe(value, name)
                if new is not value:
                    setattr(mod, name, new)
            elif isinstance(value, list):
                for i, item in enumerate(value):
                    if isinstance(item, Module):
                        value[i] = maybe(item, name)
            elif isinstance(value, tuple):
                new = tuple(
                    maybe(item, name) if isinstance(item, Module)
                    else item for item in value)
                if any(a is not b for a, b in zip(new, value)):
                    setattr(mod, name, new)
            elif isinstance(value, dict):
                for k, item in list(value.items()):
                    if isinstance(item, Module):
                        value[k] = maybe(item, name)

    walk(module)
    return count


# Thread-local guard so tree ops inside jit don't accidentally re-enter.
_local = threading.local()
