"""Registry-driven host->device transfer + batching helpers.

Behavioral parity with ``padertorch/contrib/cb/data.py``: an
``ExampleToDevice`` whose per-type and per-category handlers are
user-extensible, with variants differing in how complex numpy arrays
travel, plus ``add_batch_dim_to_dataset``.

TPU translation of the complex-handling variants:

- ``ExampleToDevice`` (reference default): complex numpy stays on host
  (torch had no stable complex support; metric code consumed it there).
- ``ExampleToDeviceNativeComplex``: complex goes to the device as a
  native complex jax array — the natural default under XLA.
- ``StackedComplexExampleToDevice`` (the torch_complex/"Kamo" analog):
  complex becomes a float array with a trailing [real, imag] axis, the
  layout the repo's ``complex_representation='stacked'`` ops consume.

>>> example = {'a': 1, 'b': [np.zeros((2, 2)), np.zeros(3, np.complex64)]}
>>> out = ExampleToDevice()(example)
>>> type(out['b'][0]).__name__, type(out['b'][1]).__name__
('ArrayImpl', 'ndarray')
>>> out = ExampleToDeviceNativeComplex()(example)
>>> out['b'][1].dtype
dtype('complex64')
>>> out = StackedComplexExampleToDevice()(example)
>>> out['b'][1].shape, str(out['b'][1].dtype)
((3, 2), 'float32')
"""
import dataclasses
import enum

import numpy as np
import jax
import jax.numpy as jnp

__all__ = [
    'ExampleToDevice',
    'ExampleToDeviceNativeComplex',
    'StackedComplexExampleToDevice',
    'KamoExampleToDevice',
    'add_batch_dim_to_dataset',
]


class Category(enum.Enum):
    Array = enum.auto()
    ComplexNumpy = enum.auto()
    JaxArray = enum.auto()
    Dataclass = enum.auto()
    DoNothing = enum.auto()


class ExampleToDevice:
    """Recursive nested transfer with extensible dispatch.

    Dispatch order: exact type (``type_register``) first, then the
    coarse :class:`Category` (``category_register``).  Register a
    handler for e.g. a custom container type or to reroute how complex
    arrays are placed.  Handlers receive ``(value, device)`` where
    ``device`` may be a ``jax.Device``, a ``jax.sharding.Sharding``, or
    None.
    """

    category = Category

    def __init__(self, type_register=None, category_register=None):
        self.type_register = {
            dict: self.mapping,
            tuple: self.sequence,
            list: self.sequence,
            **(type_register or {}),
        }
        self.category_register = {
            Category.Array: self.array,
            Category.ComplexNumpy: self.keep,
            Category.JaxArray: self.array,
            Category.Dataclass: self.dataclass,
            Category.DoNothing: self.keep,
            **(category_register or {}),
        }

    @classmethod
    def get_category(cls, value):
        if isinstance(value, np.ndarray):
            if value.dtype.kind == 'c':
                return Category.ComplexNumpy
            if value.dtype == object:
                return Category.DoNothing
            return Category.Array
        if isinstance(value, jax.Array):
            return Category.JaxArray
        if dataclasses.is_dataclass(value) and not isinstance(value, type):
            return Category.Dataclass
        return Category.DoNothing

    def __call__(self, example, device=None):
        handler = self.type_register.get(type(example))
        if handler is None:
            category = self.get_category(example)
            try:
                handler = self.category_register[category]
            except KeyError:
                raise TypeError(
                    f'No handler registered for category {category} '
                    f'(value {example!r})') from None
        return handler(example, device)

    # -- handlers -----------------------------------------------------
    def mapping(self, example, device):
        return type(example)(
            (key, self(value, device=device))
            for key, value in example.items())

    def sequence(self, example, device):
        return type(example)(
            self(value, device=device) for value in example)

    def dataclass(self, example, device):
        return dataclasses.replace(example, **{
            f.name: self(getattr(example, f.name), device=device)
            for f in dataclasses.fields(example)
        })

    @staticmethod
    def array(value, device):
        return jax.device_put(value, device)

    @staticmethod
    def keep(value, device):
        del device
        return value


class ExampleToDeviceNativeComplex(ExampleToDevice):
    """Complex numpy -> native complex jax array (XLA supports it)."""

    def __init__(self, type_register=None, category_register=None):
        super().__init__(type_register, {
            Category.ComplexNumpy: self.array,
            **(category_register or {}),
        })


# Reference name (cb/data.py:123): there complex numpy became a
# ``torch_complex.ComplexTensor`` because torch lacked stable native
# complex; XLA supports complex natively, so the Kamo transfer IS the
# native-complex transfer here.
KamoExampleToDevice = ExampleToDeviceNativeComplex


class StackedComplexExampleToDevice(ExampleToDevice):
    """Complex numpy -> float array with a trailing [real, imag] axis
    (the ``complex_representation='stacked'`` layout of ``ops._stft``)."""

    def __init__(self, type_register=None, category_register=None):
        super().__init__(type_register, {
            Category.ComplexNumpy: self.stack_complex,
            **(category_register or {}),
        })

    @staticmethod
    def stack_complex(value, device):
        stacked = np.stack(
            [value.real, value.imag], axis=-1).astype(
                np.finfo(value.dtype).dtype)
        return jax.device_put(stacked, device)


def add_batch_dim_to_dataset(dataset, batch_size, length_key='num_samples'):
    """batch -> sort-by-length -> collate, or pass through if
    ``batch_size`` is None (reference ``cb/data.py:152``)."""
    from padertorch_tpu.data.batch import Sorter
    from padertorch_tpu.data.utils import collate_fn

    if batch_size is None:
        return dataset
    assert isinstance(batch_size, int), (type(batch_size), batch_size)
    dataset = dataset.batch(batch_size)
    if batch_size > 1:
        dataset = dataset.map(Sorter(length_key))
    return dataset.map(collate_fn)
