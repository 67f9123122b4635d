"""CNN and CRNN hybrids. Reference parity: ``contrib/je/modules/hybrid.py``."""
import jax.numpy as jnp

from padertorch_tpu.base import Module
from padertorch_tpu.contrib.je.modules.conv import (
    CNN1d, CNN2d, CNNTranspose1d, CNNTranspose2d,
)

__all__ = ['CNN', 'CNNTranspose', 'CRNN']


class CNN(Module):
    """CNN2d over (B, C, M, T) followed by CNN1d over (B, C*M', T).

    Reference parity: ``hybrid.py:12``.
    """

    def __init__(self, cnn_2d: CNN2d, cnn_1d: CNN1d):
        self.cnn_2d = cnn_2d
        self.cnn_1d = cnn_1d

    def forward(self, x, seq_len=None):
        if getattr(self.cnn_2d, 'return_pool_indices', False):
            x, seq_len, indices_2d = self.cnn_2d(x, seq_len)
        else:
            x, seq_len = self.cnn_2d(x, seq_len)
            indices_2d = None
        b, c, m, t = x.shape
        x = x.reshape(b, c * m, t)
        if getattr(self.cnn_1d, 'return_pool_indices', False):
            x, seq_len, indices_1d = self.cnn_1d(x, seq_len)
            return x, seq_len, (indices_2d, indices_1d)
        return self.cnn_1d(x, seq_len)

    @classmethod
    def get_transpose_config(cls, config, transpose_config=None):
        """Mirror into a ``CNNTranspose`` config (ref ``hybrid.py:137``)."""
        assert config['factory'] == cls, (config['factory'], cls)
        if transpose_config is None:
            transpose_config = {}
        transpose_config['factory'] = CNNTranspose
        transpose_config['cnn_transpose_1d'] = \
            CNN1d.get_transpose_config(config['cnn_1d'])
        transpose_config['cnn_transpose_2d'] = \
            CNN2d.get_transpose_config(config['cnn_2d'])
        return transpose_config


class CNNTranspose(Module):
    """CNNTranspose1d then CNNTranspose2d — decoder mirror of ``CNN``.

    Reference parity: ``hybrid.py:160`` — the 1d stack's output is
    folded to (B, C, F', T) with the 2d stack's ``in_channels`` before
    the 2d transpose stack; ``target_shape`` plans the 1d stack's
    target through the 2d stack's backward shape plan.
    """

    def __init__(self, cnn_transpose_1d: CNNTranspose1d,
                 cnn_transpose_2d: CNNTranspose2d):
        self.cnn_transpose_1d = cnn_transpose_1d
        self.cnn_transpose_2d = cnn_transpose_2d

    def forward(self, x, seq_len=None, target_shape=None,
                pool_indices=None):
        if target_shape is None:
            target_shape_1d = None
        else:
            in_2d = self.cnn_transpose_2d.get_shapes(
                target_shape=target_shape)[0]
            target_shape_1d = (in_2d[0], in_2d[1] * in_2d[2], in_2d[3])
        if pool_indices is None:
            indices_2d = indices_1d = None
        else:
            indices_2d, indices_1d = pool_indices
        x, seq_len = self.cnn_transpose_1d(
            x, seq_len, target_shape=target_shape_1d,
            pool_indices=indices_1d)
        b, _, t = x.shape
        x = x.reshape(b, self.cnn_transpose_2d.in_channels, -1, t)
        return self.cnn_transpose_2d(
            x, seq_len, target_shape=target_shape,
            pool_indices=indices_2d)

    @classmethod
    def get_transpose_config(cls, config, transpose_config=None):
        assert config['factory'] == cls, (config['factory'], cls)
        if transpose_config is None:
            transpose_config = {}
        transpose_config['factory'] = CNN
        transpose_config['cnn_2d'] = CNNTranspose2d.get_transpose_config(
            config['cnn_transpose_2d'])
        transpose_config['cnn_1d'] = CNNTranspose1d.get_transpose_config(
            config['cnn_transpose_1d'])
        return transpose_config


class CRNN(Module):
    """CNN + RNN + (optional) head. Reference parity: ``hybrid.py:227``."""

    def __init__(self, cnn, rnn, fcn=None):
        self.cnn = cnn
        self.rnn = rnn
        self.fcn = fcn

    def forward(self, x, seq_len=None):
        x, seq_len = self.cnn(x, seq_len)
        x = jnp.swapaxes(x, 1, 2)  # (B, T, C)
        x = self.rnn(x, seq_len)
        if self.fcn is not None:
            x = self.fcn(x)
        return x, seq_len
