"""d-vector speaker embedding models (ResNet-style).

Reference parity: ``padertorch/contrib/tcl/speaker_embeddings/dvectors.py``
— ResNet18/34 trunks over log-mel features, statistics pooling, and a
``DVectorModel`` trained with speaker cross entropy whose penultimate
activations are the d-vectors.
"""
import jax
import jax.numpy as jnp

from padertorch_tpu.base import Model, Module
from padertorch_tpu import nn
from padertorch_tpu.ops.losses.classification import softmax_cross_entropy

__all__ = ['BasicBlock', 'ResNet18', 'ResNet34', 'FrameResNet34',
           'DVectorModel']


class _BatchNorm2d(Module):
    """Simple batch norm over (B, C, H, W) with running stats."""

    def __init__(self, num_features, eps=1e-5, momentum=0.9):
        self.eps = eps
        self.momentum = momentum
        self.weight = jnp.ones((num_features,))
        self.bias = jnp.zeros((num_features,))
        self.register_buffer('running_mean', jnp.zeros((num_features,)))
        self.register_buffer('running_var', jnp.ones((num_features,)))

    def forward(self, x):
        if self.training:
            mean = jnp.mean(x, axis=(0, 2, 3))
            var = jnp.var(x, axis=(0, 2, 3))
            self.running_mean = (
                self.momentum * self.running_mean
                + (1 - self.momentum) * jax.lax.stop_gradient(mean))
            self.running_var = (
                self.momentum * self.running_var
                + (1 - self.momentum) * jax.lax.stop_gradient(var))
        else:
            mean = self.running_mean
            var = self.running_var
        shape = (1, -1, 1, 1)
        y = (x - mean.reshape(shape)) * jax.lax.rsqrt(
            var.reshape(shape) + self.eps)
        return y * self.weight.reshape(shape) + self.bias.reshape(shape)


class BasicBlock(Module):
    def __init__(self, in_planes, planes, stride=1):
        self.conv1 = nn.Conv2d(
            in_planes, planes, 3, stride=stride, padding=1, bias=False)
        self.bn1 = _BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, padding=1, bias=False)
        self.bn2 = _BatchNorm2d(planes)
        if stride != 1 or in_planes != planes:
            self.shortcut = nn.Sequential(
                nn.Conv2d(in_planes, planes, 1, stride=stride, bias=False),
                _BatchNorm2d(planes),
            )
        else:
            self.shortcut = None

    def forward(self, x):
        out = jax.nn.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        sc = x if self.shortcut is None else self.shortcut(x)
        return jax.nn.relu(out + sc)


class _ResNet(Module):
    layers_spec = (2, 2, 2, 2)  # ResNet18

    def __init__(self, in_channels=1, base_planes=16, embedding_size=256):
        self.conv1 = nn.Conv2d(
            in_channels, base_planes, 3, padding=1, bias=False)
        self.bn1 = _BatchNorm2d(base_planes)
        blocks = []
        planes = base_planes
        in_planes = base_planes
        for i, n in enumerate(self.layers_spec):
            stride = 1 if i == 0 else 2
            for j in range(n):
                blocks.append(BasicBlock(
                    in_planes, planes, stride=stride if j == 0 else 1))
                in_planes = planes
            planes *= 2
        self.blocks = blocks
        self.out_planes = in_planes
        self.fc = nn.Linear(2 * in_planes, embedding_size)
        self.embedding_size = embedding_size

    def forward(self, x):
        """x: (B, C, M, T) log-mel -> (B, embedding_size)."""
        h = jax.nn.relu(self.bn1(self.conv1(x)))
        for block in self.blocks:
            h = block(h)
        # statistics pooling over (freq, time)
        mean = jnp.mean(h, axis=(2, 3))
        std = jnp.sqrt(jnp.maximum(jnp.var(h, axis=(2, 3)), 1e-8))
        return self.fc(jnp.concatenate([mean, std], axis=-1))


class ResNet18(_ResNet):
    layers_spec = (2, 2, 2, 2)


class ResNet34(_ResNet):
    layers_spec = (3, 4, 6, 3)


class FrameResNet34(Module):
    """Speaker-embedding ResNet34 that also returns frame-level
    embeddings (the teacher of the teacher-student pipeline).

    Reference parity: ``tcl/speaker_embeddings/dvectors.py:18``
    (``ResNet34``) — je-CNN2d trunk, output conv with stride (2, 1),
    mean over the reduced frequency axis, masked time-average pooling
    for the d-vector, affine-free batch norm on the d-vector.

    forward: log-fbank (B, T, F) + seq_len → ``(dvectors (B, E),
    embeddings (B, E, T'))``.

    >>> from padertorch_tpu import random as ptrandom
    >>> ptrandom.seed(0)
    >>> m = FrameResNet34(channels=(4, 8, 8, 8), dvec_dim=8).eval()
    >>> d, e = m(jnp.zeros((1, 64, 40)), [64])
    >>> d.shape, e.shape
    ((1, 8), (1, 8, 16))
    """

    def __init__(self, in_channels=1, channels=(64, 128, 256, 256),
                 dvec_dim=256, activation_fn='relu', norm='batch',
                 pre_activation=True, encoder_context=3):
        from padertorch_tpu.contrib.je.modules.conv import CNN2d, Conv2d
        out_channels = (3 * 2 * [channels[0]] + 4 * 2 * [channels[1]]
                        + 6 * 2 * [channels[2]] + 3 * 2 * [channels[3]])
        stride = (3 * 2 * [(1, 1)] + [(2, 2)] + (4 * 2 - 1) * [(1, 1)]
                  + 6 * 2 * [(1, 1)] + [(2, 1)]
                  + (3 * 2 - 1) * [(1, 1)])
        residual_connections = 32 * [None]
        for i in range(0, 32, 2):
            residual_connections[i] = i + 2
        self.input_convolution = Conv2d(
            in_channels, channels[0], kernel_size=encoder_context,
            stride=2, bias=False, norm=norm)
        self.resnet = CNN2d(
            in_channels=channels[0], out_channels=out_channels,
            kernel_size=32 * [3], stride=stride, pool_type=None,
            pool_size=1, residual_connections=residual_connections,
            activation_fn=activation_fn, pre_activation=pre_activation,
            norm=norm)
        self.output_convolution = Conv2d(
            channels[-1], dvec_dim, kernel_size=3, stride=(2, 1),
            bias=False, activation_fn='relu', norm=norm,
            pre_activation=True)
        self.embedding_dim = dvec_dim
        # affine-free batch norm on d-vectors (running stats)
        self.register_buffer('bn_mean', jnp.zeros((dvec_dim,)))
        self.register_buffer('bn_var', jnp.ones((dvec_dim,)))
        self.bn_momentum = 0.9
        self.reduction = 4  # time downsampling (input 2 x stage 2)

    def forward(self, x, seq_len=None):
        x = jnp.swapaxes(x, 1, 2)[:, None]  # (B, T, F) -> (B, 1, F, T)
        x, seq_len = self.input_convolution(x, seq_len)
        x, seq_len = self.resnet(x, seq_len)
        x, seq_len = self.output_convolution(x, seq_len)
        embeddings = jnp.mean(x, axis=-2)  # (B, E, T')
        if seq_len is not None:
            lens = jnp.asarray(seq_len)
            mask = (jnp.arange(embeddings.shape[-1])[None, :]
                    < lens[:, None]).astype(embeddings.dtype)
            dvectors = ((embeddings * mask[:, None]).sum(-1)
                        / jnp.maximum(lens[:, None], 1))
        else:
            dvectors = jnp.mean(embeddings, axis=-1)
        if self.training:
            mean = jnp.mean(dvectors, axis=0)
            var = jnp.var(dvectors, axis=0)
            self.bn_mean = (self.bn_momentum * self.bn_mean
                            + (1 - self.bn_momentum)
                            * jax.lax.stop_gradient(mean))
            self.bn_var = (self.bn_momentum * self.bn_var
                           + (1 - self.bn_momentum)
                           * jax.lax.stop_gradient(var))
        else:
            mean, var = self.bn_mean, self.bn_var
        dvectors = (dvectors - mean) * jax.lax.rsqrt(var + 1e-5)
        return dvectors, embeddings


class DVectorModel(Model):
    """Speaker classifier whose embedding layer yields d-vectors.

    Reference parity: ``dvectors.py:176``.
    """

    def __init__(self, trunk=None, num_speakers=100, embedding_size=256):
        if trunk is None:
            trunk = ResNet34(embedding_size=embedding_size)
        self.trunk = trunk
        self.head = nn.Linear(trunk.embedding_size, num_speakers)

    def forward(self, inputs):
        features = inputs['features']  # (B, C, M, T)
        embedding = self.trunk(features)
        logits = self.head(embedding)
        return {'embedding': embedding, 'logits': logits}

    def embed(self, inputs):
        out = self(inputs)
        e = out['embedding']
        return e / jnp.maximum(
            jnp.linalg.norm(e, axis=-1, keepdims=True), 1e-12)

    def review(self, inputs, outputs):
        labels = inputs['speaker_id']
        ce = softmax_cross_entropy(outputs['logits'], labels)
        accuracy = jnp.mean(
            (jnp.argmax(outputs['logits'], -1) == labels).astype('float32'))
        return {'loss': ce, 'scalars': {'accuracy': accuracy}}
