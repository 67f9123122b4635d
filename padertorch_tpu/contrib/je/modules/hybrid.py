"""CNN and CRNN hybrids. Reference parity: ``contrib/je/modules/hybrid.py``
(``CNN:12`` with positional encoding / conditioning / ``input_height``
config wiring, ``CNNTranspose:160``, ``CRNN:227`` with staged forward,
``post_rnn_pooling`` and ``input_size`` config wiring)."""
import numpy as np
import jax.numpy as jnp

from padertorch_tpu.base import Module
from padertorch_tpu.contrib.je.modules.conv import (
    CNN1d, CNN2d, CNNTranspose1d, CNNTranspose2d,
)

__all__ = ['CNN', 'CNNTranspose', 'CRNN']


class CNN(Module):
    """CNN2d over (B, C, M, T) followed by CNN1d over (B, C*M', T).

    Reference parity: ``hybrid.py:12`` — optional frequency-position
    encoding channel, conditioning vectors concatenated before both
    stacks, and ``input_height``-driven ``cnn_1d.in_channels``
    inference in ``finalize_dogmatic_config``.
    """

    def __init__(self, cnn_2d: CNN2d, cnn_1d: CNN1d, *,
                 input_height=None, positional_encoding=False,
                 conditional_dims=0):
        self.cnn_2d = cnn_2d
        self.cnn_1d = cnn_1d
        self.input_height = input_height
        self.positional_encoding = positional_encoding
        self.conditional_dims = conditional_dims

    def add_positional_encoding(self, x):
        """Append a linspace(0, 1) frequency-position channel
        (reference ``hybrid.py:57``)."""
        b, c, f, t = x.shape
        encoding = jnp.broadcast_to(
            jnp.linspace(0.0, 1.0, f)[:, None], (b, 1, f, t))
        return jnp.concatenate([x, encoding.astype(x.dtype)], axis=1)

    def add_condition(self, x, condition):
        """Concatenate per-example conditioning along the channel axis,
        broadcast over freq/time (reference ``hybrid.py:65``)."""
        condition = jnp.asarray(condition)
        if condition.ndim == 2:
            condition = condition[..., None]
        if x.ndim == 3:
            b, _, t = x.shape
            assert condition.ndim == 3, condition.shape
            condition = jnp.broadcast_to(
                condition, (b, condition.shape[1], t))
            return jnp.concatenate(
                [x, condition.astype(x.dtype)], axis=1)
        elif x.ndim == 4:
            b, _, f, t = x.shape
            if condition.ndim == 3:
                condition = condition[:, :, None]
            assert condition.ndim == 4, condition.shape
            condition = jnp.broadcast_to(
                condition, (b, condition.shape[1], f, t))
            return jnp.concatenate(
                [x, condition.astype(x.dtype)], axis=1)
        raise ValueError('x must be 3- or 4-dimensional')

    def forward(self, x, seq_len=None, condition=None):
        assert x.ndim == 4, x.shape
        if self.positional_encoding:
            x = self.add_positional_encoding(x)
        if condition is not None:
            x = self.add_condition(x, condition)
        if getattr(self.cnn_2d, 'return_pool_indices', False):
            x, seq_len, indices_2d = self.cnn_2d(x, seq_len)
        else:
            x, seq_len = self.cnn_2d(x, seq_len)
            indices_2d = None
        b, c, m, t = x.shape
        x = x.reshape(b, c * m, t)
        if condition is not None:
            x = self.add_condition(x, condition)
        if getattr(self.cnn_1d, 'return_pool_indices', False):
            x, seq_len, indices_1d = self.cnn_1d(x, seq_len)
            return x, seq_len, (indices_2d, indices_1d)
        return self.cnn_1d(x, seq_len)

    @classmethod
    def finalize_dogmatic_config(cls, config):
        """Infer ``cnn_1d.in_channels`` from the 2d stack's output plan
        at ``input_height`` (+ ``conditional_dims``), reference
        ``hybrid.py:122``."""
        config['cnn_2d'] = {'factory': CNN2d}
        config['cnn_1d'] = {'factory': CNN1d}
        if config['input_height'] is not None:
            sub = config['cnn_2d']
            cnn_2d = CNN2d.from_config(
                sub.to_dict() if hasattr(sub, 'to_dict') else dict(sub))
            _, out_channels, output_size, _ = cnn_2d.get_shapes(
                (1, config['cnn_2d']['in_channels'],
                 config['input_height'], 1000))[-1]
            config['cnn_1d']['in_channels'] = (
                out_channels * output_size + config['conditional_dims'])

    @classmethod
    def get_transpose_config(cls, config, transpose_config=None):
        """Mirror into a ``CNNTranspose`` config (ref ``hybrid.py:139``)."""
        assert config['factory'] == cls, (config['factory'], cls)
        if transpose_config is None:
            transpose_config = {}
        transpose_config['factory'] = CNNTranspose
        transpose_config['cnn_transpose_1d'] = \
            CNN1d.get_transpose_config(config['cnn_1d'])
        transpose_config['cnn_transpose_2d'] = \
            CNN2d.get_transpose_config(config['cnn_2d'])
        return transpose_config

    def get_shapes(self, in_shape):
        """(cnn_2d per-layer shapes, cnn_1d per-layer shapes)
        (reference ``hybrid.py:148``)."""
        cnn_2d_shapes = self.cnn_2d.get_shapes(in_shape)
        out = cnn_2d_shapes[-1]
        cnn_1d_shapes = self.cnn_1d.get_shapes(
            (out[0], out[1] * out[2], out[3]))
        return cnn_2d_shapes, cnn_1d_shapes

    def get_seq_lens(self, in_lengths):
        """(cnn_2d per-layer lengths, cnn_1d per-layer lengths)
        (reference ``hybrid.py:154``)."""
        cnn_2d_lengths = self.cnn_2d.get_seq_lens(in_lengths)
        cnn_1d_lengths = self.cnn_1d.get_seq_lens(cnn_2d_lengths[-1])
        return cnn_2d_lengths, cnn_1d_lengths


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
    """CNN2d + CNN1d + RNN + (optional) pooling + head.

    Reference parity: ``hybrid.py:227`` — each stage is optional and
    overridable (``cnn_2d``/``cnn_1d``/``rnn``/``post_rnn_pooling``/
    ``fcn`` methods); ``finalize_dogmatic_config`` threads
    ``input_size`` through the stages (ref ``hybrid.py:313``).
    """

    def __init__(self, cnn_2d, cnn_1d=None, rnn=None, fcn=None, *,
                 post_rnn_pooling=None, input_size=None):
        self._cnn_2d = cnn_2d
        self._cnn_1d = cnn_1d
        self._rnn = rnn
        self._fcn = fcn
        self._post_rnn_pooling = post_rnn_pooling
        self.input_size = input_size

    def cnn_2d(self, x, seq_len=None):
        if self._cnn_2d is not None:
            x, seq_len = self._cnn_2d(x, seq_len)
        if x.ndim != 3:
            assert x.ndim == 4, x.shape
            b, c, f, t = x.shape
            x = x.reshape(b, c * f, t)
        return x, seq_len

    def cnn_1d(self, x, seq_len=None):
        if self._cnn_1d is not None:
            x, seq_len = self._cnn_1d(x, seq_len)
        return x, seq_len

    def rnn(self, x, seq_len=None):
        x = jnp.swapaxes(x, 1, 2)  # (B, T, F)
        if self._rnn is not None:
            out = self._rnn(x, seq_len)
            x = out[0] if isinstance(out, tuple) else out
        return x

    def post_rnn_pooling(self, x, seq_len):
        if self._post_rnn_pooling is not None:
            out = self._post_rnn_pooling(x, seq_len)
            if isinstance(out, tuple):
                x, seq_len = out
            else:
                # reduce.{Mean,Max,TakeLast,...} collapse the sequence
                # axis and return only the pooled tensor
                x, seq_len = out, None
        return x, seq_len

    def fcn(self, x):
        if self._fcn is not None:
            x = self._fcn(x)
        return x

    def forward(self, x, seq_len=None):
        x, seq_len = self.cnn_2d(x, seq_len)
        x, seq_len = self.cnn_1d(x, seq_len)
        x = self.rnn(x, seq_len=seq_len)
        x, seq_len = self.post_rnn_pooling(x, seq_len)
        y = self.fcn(x)
        return y, seq_len

    input_size_key = 'input_size'

    @classmethod
    def finalize_dogmatic_config(cls, config):
        from padertorch_tpu.contrib.je.modules.rnn import GRU
        from padertorch_tpu.modules.fully_connected import (
            fully_connected_stack)
        config['cnn_2d'] = {'factory': CNN2d}
        config['cnn_1d'] = {'factory': CNN1d}
        config['rnn'] = {'factory': GRU}
        config['fcn'] = {'factory': fully_connected_stack}
        input_size = config[cls.input_size_key]
        if config['cnn_2d'] is not None and input_size is not None:
            in_channels = config['cnn_2d']['in_channels']
            sub = config['cnn_2d']
            cnn_2d = CNN2d.from_config(
                sub.to_dict() if hasattr(sub, 'to_dict') else dict(sub))
            shape = cnn_2d.get_shapes(
                (1, in_channels, input_size, 1000))[-1]
            input_size = shape[1] * shape[2]
        if config['cnn_1d'] is not None:
            if input_size is not None:
                config['cnn_1d']['in_channels'] = input_size
            input_size = list(config['cnn_1d']['out_channels'])[-1]
        if config['rnn'] is not None:
            if input_size is not None:
                config['rnn']['input_size'] = input_size
            input_size = config['rnn']['hidden_size']
        if config['fcn'] is not None:
            config['fcn']['input_size'] = input_size
