"""Explicit-but-ergonomic PRNG plumbing.

torch models draw randomness implicitly (dropout, init); JAX requires
explicit keys.  To keep the reference's user API (``forward(example)``
without a key argument, parameters created in ``__init__``), two
deterministic key sources are provided:

1. **Init keys** — a process-global generator used by layer constructors.
   ``seed(n)`` resets it; two identical construction sequences after the
   same seed produce identical parameters (required by the ``test_run``
   determinism contract, reference ``train/runtime_tests.py:317``).

2. **Step keys** — a thread-local context set up by the trainer around each
   (traced) step: ``with key_context(key): model(example)``.  Inside,
   ``next_key()`` folds an incrementing trace-time counter into the context
   key, so every dropout call gets a distinct, reproducible key and the
   whole step stays a pure function of ``(params, batch, key)``.
"""
import threading
from contextlib import contextmanager

import jax

__all__ = ['seed', 'init_key', 'key_context', 'next_key', 'has_key_context']

_INIT = {'key': jax.random.PRNGKey(0), 'count': 0}
_LOCAL = threading.local()


def seed(n: int):
    """Reset the global init-key generator (affects parameter init only)."""
    _INIT['key'] = jax.random.PRNGKey(n)
    _INIT['count'] = 0


def init_key():
    """Next deterministic key for parameter initialization."""
    k = jax.random.fold_in(_INIT['key'], _INIT['count'])
    _INIT['count'] += 1
    return k


def _stack():
    if not hasattr(_LOCAL, 'stack'):
        _LOCAL.stack = []
    return _LOCAL.stack


@contextmanager
def key_context(key):
    """Provide a PRNG key to ``next_key()`` calls within the block.

    The counter is a Python int advanced at trace time, so under ``jit``
    each ``next_key()`` call site gets a fixed, distinct fold — the traced
    program is deterministic given the context key.
    """
    frame = {'key': key, 'count': 0}
    _stack().append(frame)
    try:
        yield
    finally:
        _stack().pop()


def has_key_context():
    return bool(_stack())


def next_key():
    """Next key derived from the innermost :func:`key_context`."""
    stack = _stack()
    if not stack:
        raise RuntimeError(
            'next_key() called outside a key_context. The Trainer sets one '
            'up per step; for manual calls use '
            '`with pt.random.key_context(jax.random.PRNGKey(0)): ...`.'
        )
    frame = stack[-1]
    k = jax.random.fold_in(frame['key'], frame['count'])
    frame['count'] += 1
    return k
