"""je augment gaussian-blur helpers, label filters and alignment
encoders (reference ``je/modules/augment.py:258-420``,
``je/data/filters.py``, ``je/data/transforms.py:421-461``).

Golden values are the reference's kornia-derived doctest outputs."""
import numpy as np
import jax
import jax.numpy as jnp

import padertorch_tpu as pt
from padertorch_tpu.contrib.je.modules.augment import (
    GaussianBlur2d, gaussian, get_gaussian_kernel1d, get_gaussian_kernel2d,
)
from padertorch_tpu.contrib.je.data.filters import (
    DiscardLabelsFilter, RestrictLabelsFilter,
)
from padertorch_tpu.contrib.je.data.transforms import (
    AlignmentEncoder, MultiHotAlignmentEncoder,
)


def test_gaussian_kernel_golden_values():
    np.testing.assert_allclose(
        np.asarray(get_gaussian_kernel1d(3, 2.5)),
        [0.3243, 0.3513, 0.3243], atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(get_gaussian_kernel1d(5, 1.5)),
        [0.1201, 0.2339, 0.2921, 0.2339, 0.1201], atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(get_gaussian_kernel2d(3, 1.5)),
        [[0.0947, 0.1183, 0.0947],
         [0.1183, 0.1478, 0.1183],
         [0.0947, 0.1183, 0.0947]], atol=1e-4)
    # batched sigma -> per-example kernels, each row-normalized
    k = get_gaussian_kernel2d(3, jnp.asarray([0.5, 1.0, 2.0]))
    assert k.shape == (3, 3, 3)
    np.testing.assert_allclose(np.asarray(k.sum((-2, -1))), 1.0, atol=1e-5)
    # even sizes need force_even
    try:
        get_gaussian_kernel1d(4, 1.0)
        raise AssertionError('expected TypeError')
    except TypeError:
        pass
    assert get_gaussian_kernel1d(4, 1.0, force_even=True).shape == (4,)


def test_gaussian_blur_per_example_sigma_golden():
    """Delta image blurred with sigmas [.5, 1, 2] reproduces the
    reference doctest outputs (each example uses its own kernel)."""
    x = jnp.zeros((3, 1, 5, 5)).at[:, :, 2, 2].set(1.0)
    blur = GaussianBlur2d(
        3, sigma_sampling_fn=lambda key, shape: jnp.asarray([.5, 1., 2.]))
    blur.train()
    with pt.random.key_context(jax.random.PRNGKey(0)):
        y = blur(x)
    assert y.shape == (3, 1, 5, 5)
    expected_centers = [
        [[0.0113, 0.0838, 0.0113],
         [0.0838, 0.6193, 0.0838],
         [0.0113, 0.0838, 0.0113]],
        [[0.0751, 0.1238, 0.0751],
         [0.1238, 0.2042, 0.1238],
         [0.0751, 0.1238, 0.0751]],
        [[0.1019, 0.1154, 0.1019],
         [0.1154, 0.1308, 0.1154],
         [0.1019, 0.1154, 0.1019]],
    ]
    for i, expected in enumerate(expected_centers):
        np.testing.assert_allclose(
            np.asarray(y[i, 0, 1:4, 1:4]), expected, atol=1e-4)
        # nothing leaked outside the 3x3 support
        assert float(y[i, 0, 0].max()) < 1e-6
    # eval mode: identity
    blur.eval()
    np.testing.assert_array_equal(np.asarray(blur(x)), np.asarray(x))


def test_gaussian_blur_multichannel_shares_example_kernel():
    pt.random.seed(0)
    x = jnp.zeros((2, 3, 7, 7)).at[:, :, 3, 3].set(1.0)
    blur = GaussianBlur2d(
        5, sigma_sampling_fn=lambda key, shape: jnp.asarray([1., 2.]))
    blur.train()
    with pt.random.key_context(jax.random.PRNGKey(1)):
        y = blur(x)
    # all channels of one example are blurred identically
    np.testing.assert_allclose(
        np.asarray(y[0, 0]), np.asarray(y[0, 2]), atol=1e-6)
    # different examples differ
    assert np.abs(np.asarray(y[0, 0]) - np.asarray(y[1, 0])).max() > 1e-3


def test_label_filters():
    keep = DiscardLabelsFilter('events', 'dog')
    assert keep({'events': ['cat', 'bird']})
    assert not keep({'events': ['cat', 'dog']})
    assert keep({'events': 'cat'})
    restrict = RestrictLabelsFilter('events', ['dog', 'cat'])
    assert restrict({'events': 'cat'})
    assert not restrict({'events': ['bird']})


def _fitted(encoder_cls, labels, **kwargs):
    enc = encoder_cls(label_key='events', **kwargs)
    enc.initialize_labels(labels=labels)
    return enc


def test_alignment_encoder():
    enc = _fitted(AlignmentEncoder, ['a', 'b', 'c'])
    example = {
        'stft': np.zeros((1, 8, 5)),
        'events': ['b', 'c'],
        'events_start_frames': [1, 4],
        'events_stop_frames': [3, 6],
    }
    out = enc(example)
    np.testing.assert_array_equal(
        out['events'], [0, 1, 1, 0, 2, 2, 0, 0])
    assert out['events'].dtype == np.float32


def test_multi_hot_alignment_encoder():
    enc = _fitted(MultiHotAlignmentEncoder, ['a', 'b', 'c'])
    example = {
        'stft': np.zeros((1, 6, 5)),
        'events': ['a', 'c'],
        'events_start_frames': [0, 2],
        'events_stop_frames': [4, 5],
    }
    out = enc(example)
    expected = np.zeros((6, 3), np.float32)
    expected[0:4, 0] = 1
    expected[2:5, 2] = 1
    np.testing.assert_array_equal(out['events'], expected)
