"""Dataclass-driven configurable blocks.

Behavioral parity with ``padertorch/contrib/jensheit/base.py`` (a
``Parameterized`` base whose options live in a nested ``opts``
dataclass), re-expressed on top of this repo's ``Configurable``:
option discovery goes through ``dataclasses.fields`` and unknown
keyword arguments fail with the offending names listed.
"""
import dataclasses

from padertorch_tpu.configurable import Configurable
from padertorch_tpu.module import Module

__all__ = ['Parameterized', 'BuildingBlock', 'dict_func']


def dict_func(in_dict):
    """Usable as a dataclass default for dict-valued options (mutable
    defaults need a factory); each instance gets its own copy."""
    return dataclasses.field(default_factory=dict(in_dict).copy)


class Parameterized(Configurable):
    """Configurable with a nested ``opts`` dataclass holding all options.

    Subclasses declare their options once::

        class MyBlock(Parameterized):
            @dataclass
            class opts:
                units: int = 64

    Construction accepts either the option values as keyword arguments
    or a pre-built instance via ``opts=``.  The dataclass defaults feed
    ``finalize_dogmatic_config``, so ``MyBlock.get_config()`` shows them.
    """

    @dataclasses.dataclass
    class opts:
        """Subclasses override this with their option fields."""

    def __init__(self, **kwargs):
        super().__init__()
        given = kwargs.pop('opts', None)
        if given is not None:
            assert dataclasses.is_dataclass(given), (
                f'opts= must be a dataclass instance, got {type(given)}')
            assert not kwargs, (
                f'Pass either opts= or option kwargs, not both: {kwargs}')
            self.opts = given
            return
        known = {f.name for f in dataclasses.fields(self.opts)}
        unknown = set(kwargs) - known
        if unknown:
            raise TypeError(
                f'{type(self).__name__} got unknown option(s) '
                f'{sorted(unknown)}; declared: {sorted(known)}')
        self.opts = self.opts(**kwargs)

    def __repr__(self):
        return f'{type(self).__name__}:\n{self.opts}'

    @classmethod
    def finalize_dogmatic_config(cls, config):
        defaults = cls.opts()
        for f in dataclasses.fields(defaults):
            config[f.name] = getattr(defaults, f.name)


class BuildingBlock(Parameterized, Module):
    """A Parameterized NN block: ``build()`` runs once at construction
    and is where subclasses create their parameters from ``self.opts``."""

    def __init__(self, **options):
        super().__init__(**options)
        self.build()

    def forward(self, *args, **kwargs):
        raise NotImplementedError(
            f'{type(self).__name__} must implement forward')

    def build(self, *args, **kwargs):
        """Default: nothing to build."""
