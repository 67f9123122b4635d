"""Frame-level student d-vector extractor (ResNet34 without time
pooling).

Reference parity:
``padertorch/contrib/tcl/speaker_embeddings/student_embeddings.py:13``
(``StudentdVectors``) — a ResNet34-style CNN2d over log-fbank features
that keeps the time axis: input conv (stride 2), 16 residual pairs with
freq/time downsampling at the block boundaries, output conv
(stride (2, 1)), mean over the reduced frequency axis, and an avg-pool
smoothing over time.  Emits K frame-level embedding streams per
example.  The auxiliary AAM head mirrors the reference's built-in
``AngularPenaltySMLoss`` member.

TPU notes: the whole trunk is one feed-forward conv stack — every conv
lands on the MXU, lengths are tracked statically through the stride
plan (the reference's ``get_reduction`` probe becomes arithmetic).
"""
import numpy as np
import jax.numpy as jnp

from padertorch_tpu.base import Module
from padertorch_tpu.contrib.je.modules.conv import CNN2d, Conv2d, Pool1d
from padertorch_tpu.contrib.tcl.speaker_embeddings.loss import (
    AngularPenaltySMLoss,
)

__all__ = ['StudentdVectors']


class StudentdVectors(Module):
    """Log-fbank (B, F, T) → frame-level embeddings (B, K, E, T').

    >>> from padertorch_tpu import random as ptrandom
    >>> ptrandom.seed(0)
    >>> m = StudentdVectors(channels=(4, 8, 8, 8), dvec_dim=8,
    ...                     num_classes=10).eval()
    >>> import jax.numpy as jnp
    >>> x, seq_len = m(jnp.zeros((1, 40, 64)), [64])
    >>> x.shape
    (1, 1, 8, 6)
    >>> m.reduction
    4
    """

    def __init__(self, in_channels=1, channels=(64, 128, 256, 256),
                 dvec_dim=256, num_spk=1, activation_fn='relu',
                 norm='batch', pre_activation=True, encoder_context=3,
                 pool_stride=1, pool_size=11, num_classes=5994):
        # ResNet34 plan: (3, 4, 6, 3) pairs of 3x3 convs with residual
        # connections every 2 layers; freq/time stride at stage starts
        out_channels = (3 * 2 * [channels[0]] + 4 * 2 * [channels[1]]
                        + 6 * 2 * [channels[2]] + 3 * 2 * [channels[3]])
        assert len(out_channels) == 32, len(out_channels)
        kernel_size = 32 * [3]
        stride = (3 * 2 * [(1, 1)] + [(2, 2)] + (4 * 2 - 1) * [(1, 1)]
                  + 6 * 2 * [(1, 1)] + [(2, 1)] + (3 * 2 - 1) * [(1, 1)])
        residual_connections = 32 * [None]
        for i in range(0, 32, 2):
            residual_connections[i] = i + 2
        self.input_convolution = Conv2d(
            in_channels, channels[0], kernel_size=encoder_context,
            stride=2, bias=False, norm=norm)
        self.resnet = CNN2d(
            in_channels=channels[0],
            out_channels=out_channels,
            kernel_size=kernel_size,
            stride=stride,
            pool_type=None,
            pool_size=1,
            residual_connections=residual_connections,
            activation_fn=activation_fn,
            pre_activation=pre_activation,
            norm=norm,
        )
        self.output_convolution = Conv2d(
            channels[-1], dvec_dim * num_spk, kernel_size=3,
            stride=(2, 1), bias=False, activation_fn='relu', norm=norm,
            pre_activation=True)
        self.output_pooling = Pool1d(
            pool_type='avg', pool_size=pool_size,
            pool_stride=pool_stride)
        self.embedding_dim = dvec_dim
        self.num_spk = num_spk
        self.pool_size = pool_size
        # auxiliary AAM classification head over the d-vectors (the
        # reference constructs it with in_features=channels[-1] — a
        # latent dim its own embeddings never have; built here with the
        # embedding dim so `model.aam(d_vectors, labels)` actually
        # composes)
        self.aam = AngularPenaltySMLoss(
            in_features=dvec_dim, out_features=num_classes)
        # time reduction: input conv stride 2 x resnet time stride 2
        time_strides = [2] + [s[1] for s in stride] + [1]
        self.reduction = int(np.prod(time_strides))

    def forward(self, x, seq_len=None):
        """x: (B, F, T) log-fbank; returns ((B, K, E, T'), seq_len')."""
        x = x[:, None]  # (B, 1, F, T)
        x, seq_len = self.input_convolution(x, seq_len)
        x, seq_len = self.resnet(x, seq_len)
        x, seq_len = self.output_convolution(x, seq_len)
        x = jnp.mean(x, axis=-2)  # (B, K*E, T')
        x, seq_len = self.output_pooling(x, seq_len)
        b, ke, t = x.shape
        x = x.reshape(b, self.num_spk, self.embedding_dim, t)
        return x, seq_len
