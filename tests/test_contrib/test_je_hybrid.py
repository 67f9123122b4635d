"""je hybrid CNN/CRNN tests mirroring the reference doctests
(``padertorch/contrib/je/modules/hybrid.py:12-345``)."""
import numpy as np
import jax
import jax.numpy as jnp

import padertorch_tpu as pt
from padertorch_tpu.contrib.je.modules.hybrid import CNN, CRNN
from padertorch_tpu.contrib.je.modules.conv import CNN1d, CNN2d


def test_cnn_config_with_input_height_and_condition():
    # mirror of the reference CNN doctest (hybrid.py:16-33)
    pt.random.seed(0)
    config = CNN.get_config(dict(
        factory=CNN,
        input_height=80,
        conditional_dims=10,
        cnn_2d=dict(in_channels=11, out_channels=3 * [32],
                    kernel_size=3),
        cnn_1d=dict(out_channels=3 * [32], kernel_size=3),
    ))
    # in_channels inferred: 32 * 80 + 10 conditional dims
    assert config['cnn_1d']['in_channels'] == 32 * 80 + 10
    cnn = CNN.from_config(config)
    x = jnp.asarray(np.random.RandomState(0).randn(3, 1, 80, 11),
                    'float32')
    c = jnp.asarray(np.random.RandomState(1).randn(3, 10, 11),
                    'float32')
    y, seq_len = cnn(x, 3 * [11], condition=c)
    assert y.shape == (3, 32, 11), y.shape


def test_cnn_positional_encoding_channel():
    pt.random.seed(1)
    cnn = CNN(
        CNN2d(in_channels=2, out_channels=[4], kernel_size=3),
        CNN1d(in_channels=4 * 16, out_channels=[8], kernel_size=3),
        positional_encoding=True)
    x = jnp.zeros((2, 1, 16, 10))
    enc = cnn.add_positional_encoding(x)
    assert enc.shape == (2, 2, 16, 10)
    np.testing.assert_allclose(
        np.asarray(enc[0, 1, :, 0]), np.linspace(0, 1, 16), atol=1e-6)
    y, _ = cnn(x, [10, 10])
    assert y.shape == (2, 8, 10)


def test_cnn_shape_and_seq_len_plans_match_forward():
    pt.random.seed(2)
    cnn = CNN(
        CNN2d(in_channels=1, out_channels=[4, 8], kernel_size=3,
              pool_size=2),
        CNN1d(in_channels=8 * 4, out_channels=[16], kernel_size=3))
    in_shape = (2, 1, 16, 40)
    shapes_2d, shapes_1d = cnn.get_shapes(in_shape)
    lens_2d, lens_1d = cnn.get_seq_lens(np.array([40, 29]))
    x = jnp.asarray(np.random.RandomState(2).randn(*in_shape),
                    'float32')
    y, seq_len = cnn(x, [40, 29])
    assert tuple(shapes_1d[-1]) == y.shape
    np.testing.assert_array_equal(lens_1d[-1], np.asarray(seq_len))


def test_crnn_config_and_forward():
    # mirror of the reference CRNN doctest (hybrid.py:228-244)
    pt.random.seed(3)
    crnn = CRNN.from_config(CRNN.get_config({
        'input_size': 80,
        'cnn_2d': {'in_channels': 1, 'out_channels': [32, 32, 16],
                   'kernel_size': 3},
        'cnn_1d': {'out_channels': [32, 32, 16], 'kernel_size': 3},
        'rnn': {'hidden_size': 64},
        'fcn': {'hidden_size': 32, 'output_size': 10},
    }))
    # the fcn stack contains Dropout -> needs an ambient key context
    with pt.random.key_context(jax.random.PRNGKey(0)):
        y, seq_len = crnn(jnp.zeros((4, 1, 80, 100)))
    assert y.shape == (4, 100, 10), y.shape


def test_crnn_stages_optional():
    pt.random.seed(4)
    from padertorch_tpu.contrib.je.modules.rnn import GRU
    crnn = CRNN(None, None, GRU(8, 16), None)
    y, _ = crnn(jnp.zeros((2, 1, 8, 12)))  # (B,C,F,T) folded to (B,8,12)
    assert y.shape == (2, 12, 16)


def test_crnn_post_rnn_pooling():
    pt.random.seed(5)
    from padertorch_tpu.contrib.je.modules.rnn import GRU
    from padertorch_tpu.contrib.je.modules.reduce import Mean
    crnn = CRNN(None, None, GRU(8, 16), None,
                post_rnn_pooling=Mean(axis=1))
    y, _ = crnn(jnp.ones((2, 1, 8, 12)))
    assert y.shape == (2, 16), y.shape
