"""cb/data.py ExampleToDevice variants + cb/track.py memory trackers
(ref cb/data.py, cb/track.py:527,565,754)."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from padertorch_tpu.contrib.cb.data import (
    ExampleToDevice, ExampleToDeviceNativeComplex,
    StackedComplexExampleToDevice, add_batch_dim_to_dataset,
)


@dataclasses.dataclass
class Point:
    x: np.ndarray
    name: str


def make_example():
    return {
        'a': 1,
        'b': [np.zeros((2, 2)), np.zeros(3, np.complex64)],
        'c': Point(x=np.ones(2), name='p'),
    }


def test_default_keeps_complex_on_host():
    out = ExampleToDevice()(make_example())
    assert isinstance(out['b'][0], jax.Array)
    assert isinstance(out['b'][1], np.ndarray)
    assert out['b'][1].dtype.kind == 'c'
    assert isinstance(out['c'].x, jax.Array)
    assert out['c'].name == 'p'
    assert out['a'] == 1


def test_native_complex():
    out = ExampleToDeviceNativeComplex()(make_example())
    assert isinstance(out['b'][1], jax.Array)
    assert jnp.iscomplexobj(out['b'][1])


def test_stacked_complex():
    example = make_example()
    example['b'][1] = (np.arange(3) + 1j * np.arange(3)).astype(
        np.complex64)
    out = StackedComplexExampleToDevice()(example)
    assert out['b'][1].shape == (3, 2)
    np.testing.assert_array_equal(
        np.asarray(out['b'][1][:, 0]), np.arange(3))
    np.testing.assert_array_equal(
        np.asarray(out['b'][1][:, 1]), np.arange(3))


def test_custom_category_register():
    to_device = ExampleToDevice(category_register={
        ExampleToDevice.category.ComplexNumpy: lambda x, d: 'replaced',
    })
    out = to_device(make_example())
    assert out['b'][1] == 'replaced'


def test_add_batch_dim_to_dataset():
    from padertorch_tpu.data import dataset as lazy
    examples = {
        f'e{i}': {'x': np.ones(10 - i), 'num_samples': 10 - i}
        for i in range(4)
    }
    ds = add_batch_dim_to_dataset(
        lazy.from_dict(examples), batch_size=2)
    batch = next(iter(ds))
    assert len(batch['num_samples']) == 2
    # Sorter puts the longer example first
    assert batch['num_samples'][0] >= batch['num_samples'][1]
    assert add_batch_dim_to_dataset('sentinel', None) == 'sentinel'


def test_memory_trackers_report():
    from padertorch_tpu import nn, random as ptrandom
    from padertorch_tpu.contrib.cb.track import (
        track, IOPMemTracker, CPUMemTracker, DeviceMemTracker)
    ptrandom.seed(0)
    net = nn.Sequential(nn.Linear(4, 64), nn.ReLU(), nn.Linear(64, 2))
    with track(net, trackers=[
            IOPMemTracker(), CPUMemTracker(), DeviceMemTracker()]) as report:
        _ = net(jnp.ones((7, 4)))
    text = str(report)
    assert 'in/out/param bytes' in text
    assert 'CPU mem' in text
    assert 'device mem' in text
    # the first Linear moves 7*4*4 in, 7*64*4 out, (4*64+64)*4 params
    assert '112 / 1_792 / 1_280 B' in text, text
