"""Reference model family for the distance estimator.

Reference parity:
``contrib/examples/source_localization/distance_estimator/model.py`` —
``SamePadding:12``, ``Pool:42``, ``_Conv:63`` (incl. the GLU gated-conv
branch), ``CNN1D/CNN2D:169,173``, ``HybridCNNnn:177``, ``GRU:206``,
``CRNN:218`` and the class-quantized CE ``DistanceEstimator:243``
(argmax class -> distance, mae/rmse, accuracy + allow-neighbors
pseudo-accuracy computed in ``modify_summary``).

The recipe's ``train.py`` default remains the compact regression CRNN
(one jitted graph, masked GRU); this module provides the reference's
configurable classification family on the same framework blocks so a
reference user finds the exact model surface.  Convs run as
``lax.conv_general_dilated`` on the MXU; pooling is one
``lax.reduce_window``.
"""
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from padertorch_tpu import nn
from padertorch_tpu.base import Model
from padertorch_tpu.module import Module
from padertorch_tpu.modules.fully_connected import fully_connected_stack
from padertorch_tpu.modules.normalization import Normalization
from padertorch_tpu.modules.recurrent import GRU as _FrameworkGRU
from padertorch_tpu.ops.mappings import ACTIVATION_FN_MAP

__all__ = [
    'SamePadding', 'Pool', 'Conv1D', 'Conv2D', 'CNN1D', 'CNN2D',
    'HybridCNN', 'GRU', 'CRNN', 'DistanceEstimator',
]


class SamePadding(Module):
    """Zero-pad the trailing spatial dim(s) so a VALID conv keeps the
    size (ref ``model.py:12``; torch's asymmetric rule for even
    kernels: pad right/bottom one more)."""

    def __init__(self, kernel_size):
        assert isinstance(kernel_size, (tuple, list)), kernel_size
        assert len(kernel_size) in (1, 2), kernel_size
        self.pads = [self.split_padding(k) for k in kernel_size]

    @staticmethod
    def split_padding(kernel_size):
        if kernel_size % 2 == 0:
            return (int(np.floor((kernel_size - 1) / 2)),
                    int(np.ceil((kernel_size - 1) / 2)))
        return kernel_size // 2, kernel_size // 2

    def forward(self, x):
        pad = [(0, 0)] * (x.ndim - len(self.pads)) + list(self.pads)
        return jnp.pad(x, pad)


class Pool(Module):
    """Max/avg pooling, stride = kernel, VALID (ref ``model.py:42``)."""

    def __init__(self, pool_type, kernel_size):
        assert pool_type in ('max', 'avg'), pool_type
        assert isinstance(kernel_size, (tuple, list)), kernel_size
        assert len(kernel_size) in (1, 2), kernel_size
        self.pool_type = pool_type
        self.kernel_size = tuple(kernel_size)

    def forward(self, x):
        k = (1,) * (x.ndim - len(self.kernel_size)) + self.kernel_size
        if self.pool_type == 'max':
            return lax.reduce_window(
                x, -jnp.inf, lax.max, k, k, 'VALID')
        summed = lax.reduce_window(x, 0.0, lax.add, k, k, 'VALID')
        return summed / np.prod(self.kernel_size)


def _batch_norm(channels, spatial_ndim):
    """Channel batch norm over batch+spatial axes (torch
    BatchNorm1d/2d analog on the framework ``Normalization``)."""
    if spatial_ndim == 1:
        return Normalization(
            data_format='bct', shape=(None, channels, None),
            statistics_axis='bt')
    return Normalization(
        data_format='bcft', shape=(None, channels, None, None),
        statistics_axis='bft')


class _Conv(Module):
    """(Same-pad) conv + batch norm + activation with pre/post BN
    placement and a gated (GLU) branch (ref ``model.py:63``)."""

    conv_cls = None
    spatial_ndim = None

    def __init__(self, in_chs, out_chs, kernel_size, activation_fn='relu',
                 batch_norm=True, pre_activation=True, padding='same'):
        assert padding in ('same', False), padding
        assert isinstance(kernel_size, (tuple, list)), kernel_size
        assert len(kernel_size) == self.spatial_ndim, kernel_size
        self.pad = SamePadding(kernel_size) if padding else None
        self.conv = self.conv_cls(in_chs, out_chs, tuple(kernel_size))
        self.pre_activation = pre_activation
        if activation_fn == 'glu':
            self.activation_fn = 'glu'
            self.conv_gate = self.conv_cls(
                in_chs, out_chs, tuple(kernel_size))
            self.bn_gate = (_batch_norm(out_chs, self.spatial_ndim)
                            if batch_norm else None)
        else:
            self.activation_fn = ACTIVATION_FN_MAP[activation_fn]()
        self.bn = (_batch_norm(out_chs, self.spatial_ndim)
                   if batch_norm else None)

    def forward(self, x):
        if self.pad is not None:
            x = self.pad(x)
        y = self.conv(x)
        if self.activation_fn == 'glu':
            g = self.conv_gate(x)
            if self.bn_gate is not None:
                g = self.bn_gate(g)
            if self.bn is not None:
                y = self.bn(y)
            return y * jax.nn.sigmoid(g)
        if self.pre_activation and self.bn is not None:
            y = self.bn(y)
        y = self.activation_fn(y)
        if not self.pre_activation and self.bn is not None:
            y = self.bn(y)
        return y


class Conv1D(_Conv):
    conv_cls = nn.Conv1d
    spatial_ndim = 1


class Conv2D(_Conv):
    conv_cls = nn.Conv2d
    spatial_ndim = 2


class CNN(Module):
    """Conv/pool/dropout stack (ref ``model.py:128``)."""

    conv_block_cls = None

    def __init__(self, n_chs_input, n_chs, kernel_sizes, pool_layers,
                 activation_fn='relu', batch_norm=True,
                 pre_activation=True, padding='same', dropout_prob=0.):
        assert len(n_chs) == len(kernel_sizes) == len(pool_layers), (
            n_chs, kernel_sizes, pool_layers)
        in_chs = [n_chs[i - 1] if i > 0 else n_chs_input
                  for i in range(len(n_chs))]
        self.conv_layers = [
            self.conv_block_cls(
                in_ch, out_ch, kernel_size, activation_fn, batch_norm,
                pre_activation, padding)
            for in_ch, out_ch, kernel_size
            in zip(in_chs, n_chs, kernel_sizes)
        ]
        self.pool_layers = [
            Pool(**pool_layer) if pool_layer is not None else None
            for pool_layer in pool_layers
        ]
        # reference: dropout after every block but the last
        self.dropout_layers = (
            [nn.Dropout(dropout_prob)
             for _ in range(len(n_chs) - 1)] + [None]
            if dropout_prob > 0 else [None] * len(n_chs))
        self.n_chs = tuple(n_chs)

    def forward(self, x):
        for conv, pool, dropout in zip(
                self.conv_layers, self.pool_layers, self.dropout_layers):
            x = conv(x)
            if pool is not None:
                x = pool(x)
            if dropout is not None:
                x = dropout(x)
        return x


class CNN1D(CNN):
    conv_block_cls = Conv1D


class CNN2D(CNN):
    conv_block_cls = Conv2D


class HybridCNN(Module):
    """CNN2D over (B, C, F, T) then CNN1D over the flattened
    channel-frequency axis (ref ``model.py:177``); the config wiring
    derives the 1-d input channels from the 2-d output channels and the
    frequency bins surviving the 2-d pooling."""

    @classmethod
    def finalize_dogmatic_config(cls, config):
        config['cnn_2d'] = {
            'factory': CNN2D,
            'n_chs_input': 1,
            'n_chs': [8, 16],
            'kernel_sizes': [[3, 3], [3, 3]],
            'pool_layers': [
                {'pool_type': 'max', 'kernel_size': [4, 1]}, None],
        }
        config['cnn_1d'] = {
            'factory': CNN1D,
            'n_chs': [32],
            'kernel_sizes': [[3]],
            'pool_layers': [None],
        }
        n_freq_bins_reduced = config['n_freq_bins']
        for pool_layer in config['cnn_2d']['pool_layers']:
            if pool_layer is not None:
                n_freq_bins_reduced = np.floor(
                    n_freq_bins_reduced / pool_layer['kernel_size'][0])
        config['cnn_1d']['n_chs_input'] = int(
            config['cnn_2d']['n_chs'][-1] * n_freq_bins_reduced)

    def __init__(self, cnn_2d: CNN2D, cnn_1d: CNN1D, n_freq_bins=257):
        self.cnn_2d = cnn_2d
        self.cnn_1d = cnn_1d
        self.n_freq_bins = n_freq_bins

    def forward(self, x):
        x = self.cnn_2d(x)                      # (B, C, F, T)
        b, c, f, t = x.shape
        x = x.reshape(b, c * f, t)              # 'b c f t -> b (c f) t'
        return self.cnn_1d(x)


class GRU(Module):
    """(B, C, T) -> last-frame hidden state (ref ``model.py:206``)."""

    def __init__(self, input_size, hidden_size, n_layers=1,
                 dropout_prob=0.):
        self.gru = _FrameworkGRU(
            input_size, hidden_size, num_layers=n_layers,
            dropout=dropout_prob)

    def forward(self, x):
        x = jnp.transpose(x, (0, 2, 1))         # (B, T, C)
        out, _ = self.gru(x)
        return out[:, -1, :]


class CRNN(Module):
    """HybridCNN -> GRU -> fully connected stack (ref ``model.py:218``)."""

    @classmethod
    def finalize_dogmatic_config(cls, config):
        config['cnn'] = {'factory': HybridCNN}
        config['gru'] = {'factory': GRU, 'hidden_size': 64}
        config['fcn'] = {
            'factory': fully_connected_stack,
            'hidden_size': None,
            'output_size': 101,
        }
        # dependent wiring: the nested HybridCNN finalize runs after
        # this one, so when the user did not override the sub-config,
        # PEEK at what that finalize will produce instead of duplicating
        # its n_chs literal (which would silently desync gru.input_size
        # if HybridCNN's default ever changes)
        try:
            cnn_out = config['cnn']['cnn_1d']['n_chs'][-1]
        except (KeyError, TypeError):
            probe = {'n_freq_bins': 1}
            HybridCNN.finalize_dogmatic_config(probe)
            cnn_out = probe['cnn_1d']['n_chs'][-1]
        config['gru']['input_size'] = cnn_out
        config['fcn']['input_size'] = config['gru']['hidden_size']

    def __init__(self, cnn: HybridCNN, gru: GRU, fcn):
        self.cnn = cnn
        self.gru = gru
        self.fcn = fcn

    def forward(self, x):
        return self.fcn(self.gru(self.cnn(x)))


class DistanceEstimator(Model):
    """Class-quantized distance estimation (ref ``model.py:243``):
    the net emits ``num_cls`` logits over ``d_min + i * quant_step``
    bins, trained with cross entropy; mae/rmse follow from the argmax
    distance, and ``modify_summary`` turns the buffered class decisions
    into accuracy and the +-1-class ``acc_allow_neighbors``
    pseudo-accuracy the reference README reports.
    """

    @classmethod
    def finalize_dogmatic_config(cls, config):
        config['net'] = {'factory': CRNN}

    def __init__(self, net, num_cls=101, quant_step=.1, d_min=0):
        self.net = net
        self.num_classes = num_cls
        self.quant_step = quant_step
        self.d_min = d_min

    def forward(self, inputs):
        return self.net(inputs['features'])

    def review(self, inputs, outputs):
        target = inputs['label']
        loss = jnp.mean(
            -jax.nn.log_softmax(outputs)[
                jnp.arange(outputs.shape[0]), target])
        est_cls = jnp.argmax(outputs, axis=-1)
        est_dist = est_cls.astype('float32') * self.quant_step + self.d_min
        ae = jnp.abs(est_dist - inputs['distance'])
        se = (est_dist - inputs['distance']) ** 2
        return {
            'loss': loss,
            'scalars': {
                'mae': ae,
                'rmse': se,
                'target': target,
                'est_cls': est_cls,
            },
        }

    def modify_summary(self, summary):
        scalars = summary['scalars']
        if 'target' in scalars and 'est_cls' in scalars:
            target = np.asarray(scalars.pop('target'))
            est_cls = np.asarray(scalars.pop('est_cls'))
            near = (
                (est_cls == target)
                | (est_cls == target - 1)
                | (est_cls == target + 1)
            )
            scalars['acc_allow_neighbors'] = near.astype('float32')
            scalars['acc'] = (est_cls == target).astype('float32')
        if 'rmse' in scalars:
            scalars['rmse'] = np.sqrt(np.mean(scalars.pop('rmse')))
        summary = super().modify_summary(summary)
        return summary
