"""Small utilities (TPU-native rewrite of reference ``padertorch/utils.py``)."""
import numpy as np

__all__ = ['normalize_axis', 'to_list', 'to_numpy', 'to_python']


def normalize_axis(x, axis):
    """Map (possibly negative) axes to non-negative axes of ``x``.

    Reference parity: ``padertorch/utils.py:7``.

    >>> normalize_axis(np.zeros((2, 3)), -1)
    (1,)
    >>> normalize_axis(np.zeros((2, 3, 4)), (0, -1))
    (0, 2)
    """
    if not isinstance(axis, (tuple, list)):
        axis = (axis,)
    ndim = x.ndim
    for a in axis:
        if not -ndim <= a < ndim:
            raise ValueError(
                f'axis {a} out of bounds for array of dimension {ndim}')
    return tuple(a % ndim for a in axis)


def to_list(x, length=None):
    """Coerce ``x`` to a list, optionally broadcasting a scalar to ``length``.

    Reference parity: ``padertorch/utils.py:27``.

    >>> to_list(1, 3)
    [1, 1, 1]
    >>> to_list([1, 2])
    [1, 2]
    >>> to_list((1, 2))
    [1, 2]
    >>> to_list(range(3))
    [0, 1, 2]
    """
    if isinstance(x, list):
        pass
    elif isinstance(x, (tuple, range)):
        x = list(x)
    elif isinstance(x, (str, bytes)):
        x = [x]
    else:
        try:
            iter(x)
        except TypeError:
            x = [x]
        else:
            x = list(x)
    if length is not None:
        if len(x) == 1:
            x = x * length
        elif len(x) != length:
            raise ValueError(
                f'Expected list of length {length}, got {len(x)}: {x!r}')
    return x


def to_numpy(array, detach=False, copy=False):
    """Convert jax/numpy arrays (and scalars) to numpy.

    Reference parity: ``padertorch/utils.py:82`` (the torch ``detach``
    semantics map to jax arrays being immediately convertible; ``detach``
    is accepted for API compatibility and implies a host transfer).

    >>> import numpy as np
    >>> to_numpy(np.arange(3))
    array([0, 1, 2])
    >>> float(to_numpy(1.5))
    1.5
    """
    del detach  # jax arrays carry no autograd graph; accepted for parity
    if isinstance(array, np.ndarray):
        return np.array(array) if copy else array
    try:
        import jax
        if isinstance(array, jax.Array):
            out = np.asarray(jax.device_get(array))
            return np.array(out) if copy else out
    except ImportError:  # pragma: no cover
        pass
    return np.array(array)


def to_python(obj):
    """Recursively convert 0-d arrays / numpy scalars to Python scalars."""
    if isinstance(obj, dict):
        return {k: to_python(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return type(obj)(to_python(v) for v in obj)
    if isinstance(obj, np.generic):
        return obj.item()
    if hasattr(obj, 'ndim') and getattr(obj, 'ndim', None) == 0:
        try:
            return obj.item()
        except Exception:
            return obj
    return obj
