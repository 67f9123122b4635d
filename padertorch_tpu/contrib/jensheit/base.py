"""Parameterized building blocks: config via a nested ``opts`` dataclass.

Reference parity: ``padertorch/contrib/jensheit/base.py``
(``Parameterized``/``BuildingBlock``/``dict_func``).
"""
from dataclasses import asdict, dataclass, field

from padertorch_tpu.configurable import Configurable
from padertorch_tpu.module import Module

__all__ = ['Parameterized', 'BuildingBlock', 'dict_func']


def dict_func(in_dict):
    """dataclass field with a dict default."""
    return field(default_factory=lambda: dict(in_dict))


class Parameterized(Configurable):
    """Configurable whose options live in a nested ``opts`` dataclass.

    Subclasses declare::

        class MyBlock(Parameterized):
            @dataclass
            class opts:
                units: int = 64

    and instances get ``self.opts`` populated from kwargs (or a
    ready-made ``opts=`` instance); ``finalize_dogmatic_config`` exposes
    the dataclass defaults to the config system.
    """

    @dataclass
    class opts:
        pass

    def __init__(self, **kwargs):
        super().__init__()
        if 'opts' in kwargs:
            self.opts = kwargs['opts']
            assert hasattr(self.opts, '__dataclass_fields__')
        else:
            self.opts = self.opts(**kwargs)

    def __repr__(self):
        return f'{type(self).__name__}:\n{self.opts}'

    @classmethod
    def finalize_dogmatic_config(cls, config):
        for key, value in asdict(cls.opts()).items():
            config[key] = value


class BuildingBlock(Parameterized, Module):
    """Parameterized NN block; ``build()`` creates the parameters."""

    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        self.build()

    def forward(self, *args, **kwargs):
        raise NotImplementedError

    def build(self, *args, **kwargs):
        pass
