"""Module-tree execution tracking (shapes, dtypes, params, time, memory).

Reference parity: ``padertorch/contrib/cb/track.py`` — there implemented
with torch forward hooks; here as a context manager that intercepts
``Module.__call__`` for the duration of the block (works on eager/
non-jitted execution, which is the debugging mode this is for).

Example:
    >>> from padertorch_tpu import nn, random as ptrandom
    >>> ptrandom.seed(0)
    >>> net = nn.Sequential(nn.Linear(4, 8), nn.ReLU(), nn.Linear(8, 2))
    >>> import jax.numpy as jnp
    >>> with track(net) as tracked:
    ...     _ = net(jnp.ones((3, 4)))
    >>> print(tracked)  # doctest: +ELLIPSIS
    module...
"""
import time
from contextlib import contextmanager

import numpy as np
import jax

from padertorch_tpu.module import Module, partition

__all__ = [
    'track',
    'Tracker',
    'ShapeTracker',
    'DTypeTracker',
    'DeviceTracker',
    'ParameterTracker',
    'TimeTracker',
    'IOPNumTracker',
    'IOPMemTracker',
    'CPUMemTracker',
    'DeviceMemTracker',
    'GPUMemTracker',
    'OBackwardMemTracker',
    'GPUTotPreMemTracker',
    'GPUTotPostMemTracker',
    'tracker_list',
    'get_ParameterTracker',
]


def _shapes(obj):
    if hasattr(obj, 'shape'):
        return tuple(obj.shape)
    if isinstance(obj, (list, tuple)):
        return [_shapes(o) for o in obj]
    if isinstance(obj, dict):
        return {k: _shapes(v) for k, v in obj.items()}
    return type(obj).__name__


def _dtypes(obj):
    if hasattr(obj, 'dtype'):
        return str(obj.dtype)
    if isinstance(obj, (list, tuple)):
        return [_dtypes(o) for o in obj]
    if isinstance(obj, dict):
        return {k: _dtypes(v) for k, v in obj.items()}
    return type(obj).__name__


class Tracker:
    """One column of the report; collects a value per module call."""
    header = ''

    def pre(self, module, args, kwargs):
        pass

    def post(self, module, args, kwargs, output):
        raise NotImplementedError


class ShapeTracker(Tracker):
    header = 'input -> output'

    def post(self, module, args, kwargs, output):
        return f'{_shapes(args if len(args) != 1 else args[0])} -> ' \
               f'{_shapes(output)}'


class DTypeTracker(Tracker):
    header = 'dtype'

    def post(self, module, args, kwargs, output):
        return f'{_dtypes(output)}'


class DeviceTracker(Tracker):
    """Device placement of the output arrays (reference
    ``cb/track.py:441``; there per-tensor ``.device``, here the set of
    JAX devices the output leaves are committed to)."""
    header = 'device'

    def post(self, module, args, kwargs, output):
        devices = set()
        for leaf in jax.tree_util.tree_leaves(output):
            if hasattr(leaf, 'devices'):
                try:
                    devices |= {str(d) for d in leaf.devices()}
                except Exception:
                    pass
        return ','.join(sorted(devices)) if devices else '-'


class ParameterTracker(Tracker):
    header = '#params'

    def post(self, module, args, kwargs, output):
        params, _ = partition(module)
        n = sum(int(np.prod(np.shape(x)))
                for x in jax.tree_util.tree_leaves(params))
        return str(n)


class TimeTracker(Tracker):
    header = 'time'

    def pre(self, module, args, kwargs):
        self._t0 = time.perf_counter()

    def post(self, module, args, kwargs, output):
        try:
            jax.block_until_ready(output)
        except Exception:
            pass
        return f'{(time.perf_counter() - self._t0) * 1000:.2f} ms'


def _count_elements(obj):
    total = 0
    for leaf in jax.tree_util.tree_leaves(obj):
        if hasattr(leaf, 'shape'):
            total += int(np.prod(np.shape(leaf)))
    return total


def _count_bytes(obj):
    total = 0
    for leaf in jax.tree_util.tree_leaves(obj):
        if hasattr(leaf, 'shape') and hasattr(leaf, 'dtype'):
            total += int(np.prod(np.shape(leaf))
                         * np.dtype(leaf.dtype).itemsize)
    return total


class IOPNumTracker(Tracker):
    header = '#in/#out elements'

    def post(self, module, args, kwargs, output):
        return f'{_count_elements(args)} / {_count_elements(output)}'


class IOPMemTracker(Tracker):
    """Bytes of inputs / outputs / parameters per module call
    (reference ``cb/track.py:754``)."""
    header = 'in/out/param bytes'

    def post(self, module, args, kwargs, output):
        params, _ = partition(module)
        return (f'{_count_bytes(args):_} / {_count_bytes(output):_} / '
                f'{_count_bytes(params):_} B')


class CPUMemTracker(Tracker):
    """Process RSS delta across the module call (reference
    ``cb/track.py:527``).  Tracks the *process*, not just arrays."""
    header = 'CPU mem'

    @staticmethod
    def get_mem():
        try:
            import psutil
            import os
            return psutil.Process(os.getpid()).memory_info().rss
        except ImportError:  # pragma: no cover
            import resource
            return resource.getrusage(
                resource.RUSAGE_SELF).ru_maxrss * 1024

    def pre(self, module, args, kwargs):
        self._pre_mem = self.get_mem()

    def post(self, module, args, kwargs, output):
        return f'{self.get_mem() - self._pre_mem:_} B'


class DeviceMemTracker(Tracker):
    """Device (TPU/accelerator) memory delta across the module call —
    the GPUMemTracker analog (reference ``cb/track.py:565``).

    Uses the PJRT allocator stats when the backend exposes them;
    otherwise falls back to the summed bytes of all live jax arrays
    (exact for eager execution, which is what ``track`` runs under).
    """
    header = 'device mem'

    @staticmethod
    def get_mem():
        device = jax.local_devices()[0]
        stats = getattr(device, 'memory_stats', lambda: None)()
        if stats and 'bytes_in_use' in stats:
            return int(stats['bytes_in_use'])
        return sum(
            a.nbytes for a in jax.live_arrays()
            if a.is_fully_addressable
        )

    def pre(self, module, args, kwargs):
        try:
            jax.block_until_ready(args)
        except Exception:
            pass
        self._pre_mem = self.get_mem()

    def post(self, module, args, kwargs, output):
        try:
            jax.block_until_ready(output)
        except Exception:
            pass
        return f'{self.get_mem() - self._pre_mem:_} B'


# Reference names (cb/track.py:565): on TPU "GPU memory" is the
# accelerator memory tracked by DeviceMemTracker.
GPUMemTracker = DeviceMemTracker


class OBackwardMemTracker(Tracker):
    """Memory of the output *gradients* (cotangents) per module call
    (reference ``cb/track.py:787`` — there a torch ``register_hook``
    on every output tensor that requires grad, recording each grad's
    byte size during backward).

    Under JAX reverse-mode AD a cotangent has exactly the shape and
    dtype of its primal, and only inexact (floating/complex) leaves
    participate, so the sizes torch measures at backward time are
    static properties of the forward output — reported here without
    running a backward pass.  Matches the reference's per-tensor
    ``'a + b B'`` formatting and its ``'Missing'`` placeholder when no
    output participates in AD.
    """
    header = 'out grad mem'

    def post(self, module, args, kwargs, output):
        sizes = [
            int(np.prod(np.shape(leaf))
                * np.dtype(leaf.dtype).itemsize)
            for leaf in jax.tree_util.tree_leaves(output)
            if hasattr(leaf, 'dtype')
            and np.issubdtype(np.dtype(leaf.dtype), np.inexact)
        ]
        if not sizes:
            return 'Missing'
        return ' + '.join(f'{s:_}' for s in sizes) + ' B'


class GPUTotPreMemTracker(Tracker):
    """Total accelerator memory in use when the module call starts
    (reference cb/track.py: GPUTotPreMemTracker)."""
    header = 'tot pre mem'

    def pre(self, module, args, kwargs):
        self._pre = DeviceMemTracker.get_mem()

    def post(self, module, args, kwargs, output):
        return f'{self._pre:_} B'


class GPUTotPostMemTracker(Tracker):
    """Total accelerator memory in use after the module call returns
    (reference cb/track.py: GPUTotPostMemTracker)."""
    header = 'tot post mem'

    def post(self, module, args, kwargs, output):
        try:
            jax.block_until_ready(output)
        except Exception:
            pass
        return f'{DeviceMemTracker.get_mem():_} B'


def tracker_list(*tracker_factories):
    """Instantiate one tracker per factory, for ``track(net, ...)``
    (reference cb/track.py:273).

    >>> trackers = tracker_list(ShapeTracker, ParameterTracker)
    >>> [type(t).__name__ for t in trackers]
    ['ShapeTracker', 'ParameterTracker']
    """
    return [factory() for factory in tracker_factories]


def get_ParameterTracker(
        name='#Params',
        num_or_bytes='num',
        include_require_grad=True,
        include_not_require_grad=True,
):
    """Build a customized parameter-count tracker class (reference
    cb/track.py:471).  ``include_require_grad`` counts the trainable
    partition; ``include_not_require_grad`` counts the frozen leaves
    (buffers / non-inexact arrays)."""
    assert num_or_bytes in ('num', 'bytes'), num_or_bytes

    def _measure(tree):
        leaves = [x for x in jax.tree_util.tree_leaves(tree)
                  if hasattr(x, 'shape')]
        if num_or_bytes == 'num':
            return sum(int(np.prod(np.shape(x))) for x in leaves)
        return sum(getattr(x, 'nbytes',
                           int(np.prod(np.shape(x))) * 4) for x in leaves)

    class CustomParameterTracker(Tracker):
        header = name

        def post(self, module, args, kwargs, output):
            params, static = partition(module)
            total = 0
            if include_require_grad:
                total += _measure(params)
            if include_not_require_grad:
                total += _measure(static)
            return f'{total:_}'

    return CustomParameterTracker


class _TrackedReport:
    def __init__(self, trackers):
        self.trackers = trackers
        self.rows = []  # (name, depth, [values])

    def add(self, name, depth, values):
        self.rows.append((name, depth, values))

    def __str__(self):
        if not self.rows:
            return '(no module calls tracked)'
        headers = ['module'] + [t.header for t in self.trackers]
        table = [
            ['  ' * depth + name] + values
            for name, depth, values in self.rows
        ]
        widths = [
            max(len(str(row[i])) for row in [headers] + table)
            for i in range(len(headers))
        ]
        lines = ['  '.join(
            str(h).ljust(w) for h, w in zip(headers, widths))]
        for row in table:
            lines.append('  '.join(
                str(v).ljust(w) for v, w in zip(row, widths)))
        return '\n'.join(lines)

    def __repr__(self):
        return str(self)


@contextmanager
def track(root: Module, trackers=None):
    """Track all Module calls within the block; yields the report."""
    if trackers is None:
        trackers = [ShapeTracker(), ParameterTracker(), TimeTracker()]
    names = {id(m): (name or type(m).__name__, name.count('.'))
             for name, m in root.modules()}
    report = _TrackedReport(trackers)
    original_call = Module.__call__
    depth_holder = {'depth': 0}

    def tracked_call(self, *args, **kwargs):
        info = names.get(id(self))
        if info is None:
            return original_call(self, *args, **kwargs)
        name, _ = info
        depth = depth_holder['depth']
        depth_holder['depth'] += 1
        for t in trackers:
            t.pre(self, args, kwargs)
        try:
            output = original_call(self, *args, **kwargs)
        finally:
            depth_holder['depth'] -= 1
        values = [t.post(self, args, kwargs, output) for t in trackers]
        report.add(f'{type(self).__name__}({name})', depth, values)
        return output

    Module.__call__ = tracked_call
    try:
        yield report
    finally:
        Module.__call__ = original_call


def profile_trace(log_dir, fn, *args, steps=3, **kwargs):
    """Capture a device profile of ``fn`` into a TensorBoard trace.

    The device-side complement of :func:`track` (which times host-side
    module calls): wraps ``jax.profiler.trace`` so XLA kernel timelines
    show up under the `Profile` tab of tensorboard.

    Returns the last result of ``fn``.
    """
    import jax
    with jax.profiler.trace(str(log_dir)):
        out = None
        for _ in range(steps):
            out = fn(*args, **kwargs)
        jax.block_until_ready(out)
    return out
