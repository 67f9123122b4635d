"""CNN and CRNN hybrids. Reference parity: ``contrib/je/modules/hybrid.py``."""
import jax.numpy as jnp

from padertorch_tpu.base import Module
from padertorch_tpu.contrib.je.modules.conv import CNN1d, CNN2d

__all__ = ['CNN', 'CRNN']


class CNN(Module):
    """CNN2d over (B, C, M, T) followed by CNN1d over (B, C*M', T).

    Reference parity: ``hybrid.py:12``.
    """

    def __init__(self, cnn_2d: CNN2d, cnn_1d: CNN1d):
        self.cnn_2d = cnn_2d
        self.cnn_1d = cnn_1d

    def forward(self, x, seq_len=None):
        x, seq_len = self.cnn_2d(x, seq_len)
        b, c, m, t = x.shape
        x = x.reshape(b, c * m, t)
        return self.cnn_1d(x, seq_len)


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
