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


def test_obackward_mem_tracker():
    from padertorch_tpu import nn, random as ptrandom
    from padertorch_tpu.contrib.cb.track import track, OBackwardMemTracker
    ptrandom.seed(0)
    net = nn.Sequential(nn.Linear(4, 64), nn.ReLU(), nn.Linear(64, 2))
    with track(net, trackers=[OBackwardMemTracker()]) as report:
        _ = net(jnp.ones((7, 4)))
    text = str(report)
    assert 'out grad mem' in text
    # first Linear output cotangent: 7*64*4 bytes; head: 7*2*4 bytes
    assert '1_792 B' in text, text
    assert '56 B' in text, text


def test_obackward_mem_tracker_missing_for_integer_outputs():
    from padertorch_tpu.contrib.cb.track import OBackwardMemTracker
    from padertorch_tpu.module import Module

    class Argmax(Module):
        def forward(self, x):
            return jnp.argmax(x, axis=-1)

    t = OBackwardMemTracker()
    out = jnp.argmax(jnp.ones((3, 4)), axis=-1)
    assert t.post(Argmax(), (jnp.ones((3, 4)),), {}, out) == 'Missing'


def test_device_tracker_reports_placement():
    from padertorch_tpu import nn, random as ptrandom
    from padertorch_tpu.contrib.cb.track import track, DeviceTracker
    ptrandom.seed(0)
    net = nn.Sequential(nn.Linear(4, 8), nn.ReLU())
    with track(net, trackers=[DeviceTracker()]) as report:
        _ = net(jnp.ones((3, 4)))
    text = str(report)
    assert 'device' in text
    # the CPU test backend reports TFRT_CPU / cpu devices
    assert 'cpu' in text.lower(), text


def test_review_summary_reference_semantics():
    from padertorch_tpu.contrib.cb.summary import ReviewSummary
    import pytest as _pytest
    s = ReviewSummary(prefix='p/', visible_dB=40)
    s.add_scalar('x', 1.0)
    s.add_scalar('x', 2.0, 3.0)
    assert s['scalars']['p/x'] == [1.0, 2.0, 3.0]
    s.add_histogram('h', np.arange(3))
    s.add_histogram('h', np.arange(2))
    assert len(s['histograms']['p/h']) == 2
    s.add_buffer('b', {'n': 1})
    s.add_buffer('b', {'n': 2})
    assert [d['n'] for d in s['buffers']['p/b']] == [1, 2]
    # image ndim validation
    with _pytest.raises(AssertionError, match='ndim == 3'):
        s.add_image('bad', np.zeros((4, 4)))
    # rearrange + batch_first pass-through
    s.add_spectrogram_image(
        'spec', np.random.uniform(size=(5, 7)) + 0.1,
        rearrange='t f -> f t')
    assert s['images']['p/spec'].shape[0] in (1, 3, 4)
    # audio normalization via tbx_utils.audio
    sig, sr = (np.array([0.0, 0.5, -0.25]), None)
    s.add_audio('a', sig, sampling_rate=8000)
    wav, rate = s['audios']['p/a']
    assert rate == 8000 and abs(np.abs(wav).max() - 0.95) < 1e-6
