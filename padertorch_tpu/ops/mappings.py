"""String-to-callable dispatchers with helpful error messages.

Reference parity: ``padertorch/ops/mappings.py`` (ACTIVATION_FN_MAP).
"""
import difflib

from padertorch_tpu import nn

__all__ = ['ACTIVATION_FN_MAP', 'Dispatcher', 'DispatchError']


class DispatchError(KeyError):
    def __init__(self, item, keys):
        close = difflib.get_close_matches(str(item), [str(k) for k in keys],
                                          n=5, cutoff=0.3)
        super().__init__(f'Invalid option {item!r}. Close matches: {close}.')


class Dispatcher(dict):
    """Dict with a did-you-mean error message.

    >>> d = Dispatcher(abc=1, bcd=2)
    >>> d['abc']
    1
    >>> d['acd']  # doctest: +ELLIPSIS
    Traceback (most recent call last):
    ...
    padertorch_tpu.ops.mappings.DispatchError: "Invalid option 'acd'...
    """

    def __getitem__(self, item):
        try:
            return super().__getitem__(item)
        except KeyError:
            raise DispatchError(item, self.keys()) from None


class _CallableDispatcher(Dispatcher):
    """Callable inputs pass through unchanged (reference ``mappings.py:10``).

    >>> d = _CallableDispatcher(abc=1)
    >>> d[len]
    <built-in function len>
    """

    def __getitem__(self, item):
        if callable(item):
            return item
        return super().__getitem__(item)


ACTIVATION_FN_MAP = _CallableDispatcher(
    relu=nn.ReLU,
    prelu=nn.PReLU,
    leaky_relu=nn.LeakyReLU,
    elu=nn.ELU,
    gelu=nn.GELU,
    silu=nn.SiLU,
    tanh=nn.Tanh,
    sigmoid=nn.Sigmoid,
    softmax=nn.Softmax,  # defaults to softmax along last axis
    glu=nn.GLU,
    identity=nn.Identity,
)
